package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, V2CommandExec}
import org.apache.spark.sql.functions.{col, lit, monotonically_increasing_id, when}
import org.apache.spark.sql.graftbridge.PlanFrame

import graft.store.{Iteration, Retract, TableStore}

/** SQL `UPDATE` and `MERGE INTO` for governed tables — the last two
  * DML verbs the catalog's SQL/PySpark audience was missing (INSERT /
  * DELETE / TRUNCATE / CTAS land elsewhere in [[GraftCatalog]]).
  *
  * Spark's native path for these is the DSv2 row-level-operation
  * rewrite (`SupportsRowLevelOperations` → ReplaceData), which
  * requires executor-side DSv2 writers; this catalog deliberately
  * bridges through V1 frames so every write rides the store's own
  * verbs (bucketed upsert, index-cascading retraction, one governed
  * epoch). So DML is intercepted one level up instead — the
  * SparkSessionExtensions seam:
  *
  *  - a post-hoc resolution rule ([[GraftDml.DmlRule]]) matches the
  *    ANALYZED `UpdateTable` / `MergeIntoTable` nodes whose target is
  *    a [[GraftTable]] relation and replaces them with an opaque
  *    [[GraftDmlCommand]] capturing the resolved child plans and
  *    expressions (attribute ids intact — nothing is re-parsed);
  *  - an injected planner strategy ([[GraftDml.DmlStrategy]]) turns
  *    the command into a driver-side exec node that composes the
  *    store verbs. Non-graft targets are left untouched and keep
  *    Spark's own "not supported" errors.
  *
  * Both are injected by [[graft.functions.GraftExtensions]] — the one
  * canonical `spark.sql.extensions` entry — so any session built with
  * it (the CLI `sql` verb included) gets the verbs.
  *
  * Semantics (pinned in GraftDmlSpec):
  *
  *  - `UPDATE t SET c = e WHERE p`: on a bucketed table, the matching
  *    rows are re-projected and UPSERTED by the declared pk —
  *    O(matched + touched buckets), one epoch; assigning a pk column
  *    is refused (that is an identity change — delete + insert).
  *    Struct-field assignments (`SET s.x.y = e`) patch the named
  *    field via `withField`, siblings untouched — mixing a
  *    whole-column and a field assignment to one column is refused.
  *    On a
  *    flat un-indexed table the whole table rewrites through one
  *    atomic swap (`WHERE` keeps SQL three-valued semantics: NULL
  *    predicates leave the row unchanged). A flat table WITH per-pk
  *    indexes is refused, exactly like SQL DELETE.
  *  - `MERGE INTO t USING s ON c WHEN ...`: full clause surface —
  *    multiple conditional `WHEN MATCHED THEN UPDATE/DELETE`,
  *    `WHEN NOT MATCHED THEN INSERT`, and `WHEN NOT MATCHED BY SOURCE
  *    THEN UPDATE/DELETE`, first-matching-clause-wins. One join
  *    (right-outer, widened to full-outer only when NOT-MATCHED-BY-
  *    SOURCE clauses need unmatched target rows) is materialized once
  *    and sliced into the upsert batch and the delete key set. The
  *    standard MERGE cardinality rule is enforced (a target row
  *    matching >1 source row with matched clauses present is an
  *    error), as is pk uniqueness of the written batch (a non-pk ON
  *    condition could otherwise smuggle duplicate keys into one
  *    upsert). Deletes ride [[Retract.cascade]] (single-pk: base +
  *    every maintained index retract together) or the bucketed
  *    `deleteByPk` (composite pk); when base and indexes are all
  *    governed the deletes AND upserts commit as ONE epoch
  *    ([[TableStore.transact]]) — a reader or CDC consumer never sees
  *    a half-applied merge. Updated/inserted rows leave index
  *    maintenance to the index verbs (same contract as INSERT INTO:
  *    stale-posting detection is Doctor's job and the direction is
  *    healable — contrast deletes, where an index can never retract
  *    by upsert, hence the cascade).
  *
  * Scale: the merge join is source-batch-sized under right-outer
  * (matched target rows + the batch), never O(table) unless
  * NOT-MATCHED-BY-SOURCE semantics genuinely require scanning the
  * target side; the materialization is one parquet round-trip of that
  * join so the cardinality check, upsert slice, and delete slice do
  * not recompute it. Flat-table forms rewrite the table by one swap —
  * the same documented lakehouse-MERGE seam as the flat upsert.
  */
object GraftDml {

  /** Unwrap alias nodes to the graft DSv2 relation, if this DML
    * statement targets one.
    */
  private def graftTarget(
      plan: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
    plan match {
      case SubqueryAlias(_, child) => graftTarget(child)
      case r: DataSourceV2Relation =>
        r.table match {
          case g: GraftTable => Some((r, g))
          case _ => None
        }
      case _ => None
    }

  /** Post-hoc resolution rule: analyzed graft UPDATE/MERGE →
    * [[GraftDmlCommand]]. Only top-level nodes can be DML; anything
    * unresolved or non-graft passes through to Spark's own handling.
    */
  class DmlRule(session: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case u @ UpdateTable(target, assignments, condition) if u.resolved =>
        graftTarget(target) match {
          case Some((rel, gt)) =>
            requireCurrent(gt, "UPDATE")
            GraftDmlCommand("UPDATE", gt.graftTableName,
              sp => runUpdate(sp, gt.graftRoot, gt.graftTableName, rel,
                assignments, condition))
          case None => u
        }
      case m: MergeIntoTable if m.resolved =>
        graftTarget(m.targetTable) match {
          case Some((rel, gt)) =>
            // WITH SCHEMA EVOLUTION needs no handling here: by the
            // time the plan resolves, Spark's own rule has routed the
            // source-minus-target adds through the catalog's
            // alterTable (AUTOMATIC_SCHEMA_EVOLUTION capability) and
            // rebuilt `rel` with the widened output — the merge below
            // sees an ordinary, already-evolved target.
            requireCurrent(gt, "MERGE INTO")
            GraftDmlCommand("MERGE", gt.graftTableName,
              sp => runMerge(sp, gt.graftRoot, gt.graftTableName, rel,
                m.sourceTable, m.mergeCondition, m.matchedActions,
                m.notMatchedActions, m.notMatchedBySourceActions))
          case None => m
        }
      case _ => plan
    }
  }

  private def requireCurrent(gt: GraftTable, verb: String): Unit =
    require(gt.graftEpoch.isEmpty,
      s"$verb on ${gt.graftTableName} pinned at epoch " +
        s"${gt.graftEpoch.get} — time-travel reads are immutable")

  /** Planner strategy for the command node (injected strategies run
    * before the built-ins, so graft DML never reaches
    * DataSourceV2Strategy's unsupported-operation error).
    */
  class DmlStrategy(session: SparkSession) extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case c: GraftDmlCommand =>
        GraftDmlExec(c.verb, c.table, session, c.body) :: Nil
      case _ => Nil
    }
  }

  // -----------------------------------------------------------------
  // UPDATE
  // -----------------------------------------------------------------

  private def runUpdate(
      spark: SparkSession, root: String, table: String,
      rel: DataSourceV2Relation, assignments: Seq[Assignment],
      condition: Option[Expression]): Unit = {
    val s = new TableStore(spark, root)
    val out = rel.output
    val assignMap = assignPlanOf(assignments)
    // identity assignments (the aligned form assigns every column to
    // itself) are not "changes"
    def newValue(a: Attribute): Option[Column] =
      assignMap.get(a.exprId.id) match {
        case Some(es) if isIdentity(a, es) => None
        case Some(es) => Some(newValueFor(a, es))
        case None => None
      }
    val condCol = condition.map(PlanFrame.columnOf).getOrElse(lit(true))
    val tgt = PlanFrame.frameOf(spark, rel)
    s.bucketLayoutOf(table) match {
      case Some((_, pk)) =>
        val touchedPk = out.filter(a =>
          pk.contains(a.name) && newValue(a).isDefined)
        require(touchedPk.isEmpty,
          s"UPDATE may not assign declared pk column(s) " +
            s"${touchedPk.map(_.name).mkString(", ")} of $table — a key " +
            "change is an identity change: DELETE the old row and INSERT " +
            "the new one")
        val projected = out.map(a =>
          newValue(a).getOrElse(PlanFrame.columnOf(a)).as(a.name))
        // the relation serves SURFACE names; the store's files carry
        // physical ones — translate before landing
        val updated = s.toPhysical(table, tgt.filter(condCol).select(projected: _*))
        graft.store.IndexMaintain.upsertMaintained(s, table, updated, pk)
      case None =>
        val indexed = Retract.indexTablesOf(s, table)
        require(indexed.isEmpty,
          s"$table has maintained per-pk indexes " +
            s"(${indexed.mkString(", ")}) but no declared bucket pk — " +
            "SQL UPDATE cannot keep them consistent without a key; use " +
            "the library's upsert + index maintenance verbs")
        // whole-table rewrite, one atomic swap; NULL predicate rows
        // take the otherwise-branch (unchanged) — SQL semantics
        val rewritten = tgt.select(out.map { a =>
          newValue(a) match {
            case Some(v) =>
              when(condCol, v).otherwise(PlanFrame.columnOf(a)).as(a.name)
            case None => PlanFrame.columnOf(a).as(a.name)
          }
        }: _*)
        s.overwrite(table, s.toPhysical(table, rewritten))
    }
  }

  // -----------------------------------------------------------------
  // MERGE INTO
  // -----------------------------------------------------------------

  private sealed trait Act { def cond: Column }
  private case class Upd(cond: Column, assigns: Seq[Assignment]) extends Act
  private case class Del(cond: Column) extends Act
  private case class Ins(cond: Column, assigns: Seq[Assignment]) extends Act

  private def runMerge(
      spark: SparkSession, root: String, table: String,
      rel: DataSourceV2Relation, srcPlan: LogicalPlan, mergeCond: Expression,
      matchedActions: Seq[MergeAction], notMatchedActions: Seq[MergeAction],
      nmbsActions: Seq[MergeAction]): Unit = {
    val s = new TableStore(spark, root)
    val out = rel.output
    val srcOut = srcPlan.output
    val resolver = spark.sessionState.conf.resolver

    // `SET *` / `INSERT *` arrive pre-expanded from the analyzer on
    // most shapes; expand by name ourselves if a star action survived
    def expandStar(): Seq[Assignment] = out.map { a =>
      srcOut.filter(sa => resolver(sa.name, a.name)) match {
        case Seq(sa) => Assignment(a, sa)
        case Seq() => throw new UnsupportedOperationException(
          s"star assignment: source has no column named ${a.name}")
        case many => throw new UnsupportedOperationException(
          s"star assignment: source column ${a.name} is ambiguous " +
            s"(${many.size} candidates)")
      }
    }
    def norm(action: MergeAction): Act = action match {
      case UpdateAction(c, assigns, _) => Upd(condOf(c), assigns)
      case UpdateStarAction(c) => Upd(condOf(c), expandStar())
      case DeleteAction(c) => Del(condOf(c))
      case InsertAction(c, assigns) => Ins(condOf(c), assigns)
      case InsertStarAction(c) => Ins(condOf(c), expandStar())
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action on graft tables: $other")
    }
    val matched = matchedActions.map(norm)
    val notMatched = notMatchedActions.map(norm)
    val nmbs = nmbsActions.map(norm)
    require(notMatched.forall(_.isInstanceOf[Ins]),
      "WHEN NOT MATCHED supports INSERT only")
    require((matched ++ nmbs).forall(a =>
      a.isInstanceOf[Upd] || a.isInstanceOf[Del]),
      "WHEN [NOT] MATCHED [BY SOURCE] supports UPDATE/DELETE only")

    val layout = s.bucketLayoutOf(table)
    val flat = layout.isEmpty
    if (flat) {
      val indexed = Retract.indexTablesOf(s, table)
      require(indexed.isEmpty,
        s"$table has maintained per-pk indexes (${indexed.mkString(", ")}) " +
          "but no declared bucket pk — SQL MERGE cannot keep them " +
          "consistent without a key; use the library's verbs")
    }
    // `UPDATE SET *` assigns the pk from the source's join key — an
    // identity no-op whenever the ON condition proves equality
    // (t.pk = s.expr conjunct). Such assignments keep the TARGET value
    // (provably equal, and always identity-safe); any other pk
    // assignment is a key change and is refused.
    val onConjuncts = splitAnd(mergeCond)
    def pkIdentity(a: Attribute, v: Expression): Boolean = v match {
      case ref: AttributeReference if ref.exprId == a.exprId => true
      case _ => onConjuncts.exists {
        case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r) =>
          (l.semanticEquals(a) && r.semanticEquals(v)) ||
            (r.semanticEquals(a) && l.semanticEquals(v))
        case _ => false
      }
    }
    val pkNames: Set[String] = layout.map(_._2.toSet).getOrElse(Set.empty)
    layout.foreach { case (_, pk) =>
      val assignedPk = (matched ++ nmbs).collect { case Upd(_, assigns) =>
        val m = assignPlanOf(assigns)
        out.filter(a => pk.contains(a.name) && (m.get(a.exprId.id) match {
          case Some(Seq((Nil, v))) => !pkIdentity(a, v)
          case Some(_) => true // nested pk surgery is never identity
          case None => false
        })).map(_.name)
      }.flatten.distinct
      require(assignedPk.isEmpty,
        s"MERGE UPDATE may not assign declared pk column(s) " +
          s"${assignedPk.mkString(", ")} of $table — a key change is an " +
          "identity change: DELETE + INSERT instead (ON-equal " +
          "assignments like UPDATE SET * are exempt)")
    }

    // one join, materialized once; every later pass (cardinality
    // check, upsert slice, delete slice, flat rebuild) reads the
    // materialized frame — and the row id minted before the join is
    // thereby stable across them
    val RID = "__graft_merge_rid"
    val TM = "__graft_merge_t"
    val SM = "__graft_merge_s"
    Seq(RID, TM, SM).foreach { m =>
      require(!out.exists(_.name == m) && !srcOut.exists(_.name == m),
        s"column name $m is reserved by graft MERGE")
    }
    val needTargetOnly = nmbs.nonEmpty || flat
    val tgt = PlanFrame.frameOf(spark, rel)
      .withColumn(RID, monotonically_increasing_id())
      .withColumn(TM, lit(true))
    val src = PlanFrame.frameOf(spark, srcPlan).withColumn(SM, lit(true))
    val joined = Iteration.materialize(
      tgt.join(src, PlanFrame.columnOf(mergeCond),
        if (needTargetOnly) "full_outer" else "right_outer"))
    val isMatched = col(TM).isNotNull && col(SM).isNotNull
    val srcOnly = col(TM).isNull
    val tgtOnly = col(SM).isNull

    // guard frames (empty when clean) — evaluated together with the
    // duplicate-pk guard in ONE action below, not one job each
    val cardinalityViolation: Option[DataFrame] =
      if (matched.isEmpty) None
      else Some(joined.filter(isMatched).groupBy(col(RID)).count()
        .filter(col("count") > 1).limit(1)
        .select(lit("cardinality").as("violation")))
    def requireClean(found: Seq[String]): Unit = {
      require(!found.contains("cardinality"),
        "MERGE cardinality violation: a target row of " + table +
          " matched more than one source row and matched clauses exist — " +
          "deduplicate the source on the ON keys first")
      require(!found.contains("duplicate_pk"),
        s"MERGE would write duplicate pk rows to $table — the ON " +
          "condition does not constrain the declared pk uniquely")
    }

    // first-matching-clause-wins index over a clause group
    def idxOf(acts: Seq[Act]): Column =
      acts.zipWithIndex.foldRight(lit(-1): Column) {
        case ((a, i), els) => when(a.cond, lit(i)).otherwise(els)
      }
    def updProjection(assigns: Seq[Assignment]): Seq[Column] = {
      val m = assignPlanOf(assigns)
      out.map(a => m.get(a.exprId.id) match {
        case Some(es) if isIdentity(a, es) =>
          PlanFrame.columnOf(a).as(a.name)
        case Some(_) if pkNames.contains(a.name) =>
          // guarded above: only provably-identity pk assignments get
          // here — keep the target value (equal, and identity-safe)
          PlanFrame.columnOf(a).as(a.name)
        case Some(es) => newValueFor(a, es).as(a.name)
        case None => PlanFrame.columnOf(a).as(a.name)
      })
    }
    def insProjection(assigns: Seq[Assignment]): Seq[Column] = {
      val m = assignPlanOf(assigns)
      out.map(a => m.get(a.exprId.id) match {
        case Some(Seq((Nil, v))) => castTo(v, a).as(a.name)
        case Some(_) => throw new UnsupportedOperationException(
          s"INSERT cannot assign struct fields of ${a.name} — there is " +
            "no pre-existing row to patch")
        case None => lit(null).cast(a.dataType).as(a.name)
      })
    }

    val mIdx = idxOf(matched)
    val nIdx = idxOf(notMatched)
    val bIdx = idxOf(nmbs)

    layout match {
      case Some((_, pk)) =>
        val upserts = Seq.newBuilder[DataFrame]
        val deletes = Seq.newBuilder[DataFrame]
        matched.zipWithIndex.foreach {
          case (Upd(_, assigns), i) => upserts +=
            joined.filter(isMatched && mIdx === i)
              .select(updProjection(assigns): _*)
          case (Del(_), i) => deletes +=
            joined.filter(isMatched && mIdx === i)
              .select(pk.map(p => colByName(out, p)): _*)
          case _ =>
        }
        notMatched.zipWithIndex.foreach {
          case (Ins(_, assigns), i) => upserts +=
            joined.filter(srcOnly && nIdx === i)
              .select(insProjection(assigns): _*)
          case _ =>
        }
        nmbs.zipWithIndex.foreach {
          case (Upd(_, assigns), i) => upserts +=
            joined.filter(tgtOnly && bIdx === i)
              .select(updProjection(assigns): _*)
          case (Del(_), i) => deletes +=
            joined.filter(tgtOnly && bIdx === i)
              .select(pk.map(p => colByName(out, p)): _*)
          case _ =>
        }
        val ups = upserts.result().reduceOption(_ union _)
        val dels = deletes.result().reduceOption(_ union _)
        // a non-pk ON condition could write the same key twice in one
        // batch (insert + insert, or update + insert) — upsert
        // precedence would pick one arbitrarily; refuse instead. Both
        // guards (this and the cardinality rule) read the one
        // materialized join, unioned into a SINGLE action — a guard
        // costs one job per statement, not one per rule.
        val dupPkViolation = ups.map(_.groupBy(pk.map(col): _*).count()
          .filter(col("count") > 1).limit(1)
          .select(lit("duplicate_pk").as("violation")))
        (cardinalityViolation.toSeq ++ dupPkViolation.toSeq)
          .reduceOption(_ unionAll _)
          .foreach(g => requireClean(
            g.collect().map(_.getString(0)).toIndexedSeq))
        def applyDeletes(d: DataFrame): Unit = pk match {
          case Seq(one) => Retract.cascade(s, table, d, one)
          case _ => s.deleteByPk(table, d, pk)
        }
        def applyAll(): Unit = {
          dels.foreach(applyDeletes)
          ups.foreach(u => graft.store.IndexMaintain.upsertMaintained(
            s, table, s.toPhysical(table, u), pk))
        }
        val atomic = dels.isDefined && ups.isDefined &&
          (pk.size > 1 || Retract.cascadeAtomic(s, table)) &&
          s.governed.contains(table)
        if (atomic) s.transact(applyAll()) else applyAll()
      case None =>
        // flat single-pass rebuild: each joined row maps to ≤1 output
        // row; one swap commits it
        cardinalityViolation.foreach(g => requireClean(
          g.collect().map(_.getString(0)).toIndexedSeq))
        def chainValues(acts: Seq[Act], idx: Column, a: Attribute,
            orig: Column): Column =
          acts.zipWithIndex.foldRight(orig) {
            case ((Upd(_, assigns), i), els) =>
              val m = assignPlanOf(assigns)
              val v = m.get(a.exprId.id) match {
                case Some(es) if isIdentity(a, es) => PlanFrame.columnOf(a)
                case Some(es) => newValueFor(a, es)
                case None => PlanFrame.columnOf(a)
              }
              when(idx === i, v).otherwise(els)
            case (_, els) => els
          }
        def keep(acts: Seq[Act], idx: Column): Column =
          acts.zipWithIndex.foldRight(lit(true): Column) {
            case ((Del(_), i), els) => when(idx === i, lit(false)).otherwise(els)
            case (_, els) => els
          }
        val insValue: Attribute => Column = a =>
          notMatched.zipWithIndex.foldRight(lit(null).cast(a.dataType): Column) {
            case ((Ins(_, assigns), i), els) =>
              val m = assignPlanOf(assigns)
              val v = m.get(a.exprId.id) match {
                case Some(Seq((Nil, expr))) => castTo(expr, a)
                case Some(_) => throw new UnsupportedOperationException(
                  s"INSERT cannot assign struct fields of ${a.name}")
                case None => lit(null).cast(a.dataType)
              }
              when(nIdx === i, v).otherwise(els)
            case (_, els) => els
          }
        val keepRow =
          when(isMatched, keep(matched, mIdx))
            .when(tgtOnly, keep(nmbs, bIdx))
            .otherwise(nIdx =!= -1) // source-only: kept iff inserted
        val values = out.map { a =>
          val orig = PlanFrame.columnOf(a)
          when(isMatched, chainValues(matched, mIdx, a, orig))
            .when(tgtOnly, chainValues(nmbs, bIdx, a, orig))
            .otherwise(insValue(a))
            .as(a.name)
        }
        // with NO matched clause there is no cardinality rule to
        // refuse multi-matched target rows (standard MERGE: they are
        // simply untouched) — but the join still carries one row per
        // match. Collapse them to one by the minted row id: the
        // output values of a matched row reference only target
        // columns here (chainValues over an empty clause list is the
        // identity), so any representative row is THE row.
        val base =
          if (matched.nonEmpty) joined
          else joined.filter(!isMatched)
            .union(joined.filter(isMatched).dropDuplicates(RID))
        s.overwrite(table,
          s.toPhysical(table, base.filter(keepRow).select(values: _*)))
    }
  }

  // -----------------------------------------------------------------
  // shared helpers
  // -----------------------------------------------------------------

  private def condOf(c: Option[Expression]): Column =
    c.map(PlanFrame.columnOf).getOrElse(lit(true))

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Per-TOP-LEVEL-attribute assignment entries: `(path, value)`
    * where an empty path is a whole-column assignment and a non-empty
    * one names a struct field chain (`SET s.x.y = v`). Array/map
    * element assignment has no SQL surface here and is refused.
    */
  private type NestedAssigns = Seq[(Seq[String], Expression)]

  private def splitKey(
      key: Expression): (AttributeReference, Seq[String]) = key match {
    case ar: AttributeReference => (ar, Nil)
    case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
      val (root, p) = splitKey(g.child)
      (root, p :+ g.extractFieldName)
    case k => throw new UnsupportedOperationException(
      "graft DML supports column and struct-field assignments only " +
        s"(got: $k)")
  }

  private def assignPlanOf(
      assigns: Seq[Assignment]): Map[Long, NestedAssigns] =
    assigns.map(a => (splitKey(a.key), a.value))
      .groupBy(_._1._1.exprId.id)
      .map { case (id, xs) =>
        val entries: NestedAssigns = xs.map { case ((_, p), v) => (p, v) }
        require(entries.count(_._1.isEmpty) == 0 || entries.size == 1,
          "cannot mix a whole-column assignment with struct-field " +
            "assignments to the same column in one statement")
        id -> entries
      }

  private def isIdentity(a: Attribute, es: NestedAssigns): Boolean =
    es match {
      case Seq((Nil, ref: AttributeReference)) => ref.exprId == a.exprId
      case _ => false
    }

  /** The column's new value under its assignment entries — a cast
    * whole value, or the original with each named field replaced
    * ([[Column.withField]]), every value lossless-cast to the field's
    * declared type.
    */
  private def newValueFor(a: Attribute, es: NestedAssigns): Column =
    es match {
      case Seq((Nil, v)) => castTo(v, a)
      case nested => nested.foldLeft(PlanFrame.columnOf(a)) {
        case (c, (path, v)) =>
          val ft = fieldTypeOf(a.dataType, path,
            s"${a.name}.${path.mkString(".")}")
          c.withField(path.map(quotePart).mkString("."),
            castToType(v, ft, s"${a.name}.${path.mkString(".")}"))
      }
    }

  private def quotePart(p: String): String =
    if (p.contains(".") || p.contains("`")) "`" + p.replace("`", "``") + "`"
    else p

  private def fieldTypeOf(
      dt: org.apache.spark.sql.types.DataType, path: Seq[String],
      label: String): org.apache.spark.sql.types.DataType =
    path.foldLeft(dt) {
      case (st: org.apache.spark.sql.types.StructType, name) =>
        st.find(_.name == name).getOrElse(throw new IllegalStateException(
          s"$label: no field $name in ${st.simpleString}")).dataType
      case (other, name) => throw new UnsupportedOperationException(
        s"$label: cannot assign field $name inside ${other.simpleString} " +
          "— struct fields only")
    }

  private def colByName(out: Seq[Attribute], name: String): Column =
    PlanFrame.columnOf(out.find(_.name == name).getOrElse(
      throw new IllegalStateException(
        s"declared pk column $name is missing from the table surface")))
      .as(name)

  /** Assignment value as a Column, losslessly cast to the target
    * column's (or struct field's) type; a lossy assignment is refused
    * loudly (graft DML never silently narrows).
    */
  private def castTo(v: Expression, a: Attribute): Column =
    castToType(v, a.dataType, a.name)

  private def castToType(
      v: Expression, dt: org.apache.spark.sql.types.DataType,
      label: String): Column = {
    val c = PlanFrame.columnOf(v)
    if (v.dataType == dt) c
    else {
      require(Cast.canUpCast(v.dataType, dt),
        s"cannot assign ${v.dataType.simpleString} to " +
          s"$label: ${dt.simpleString} — no lossless cast; " +
          "CAST explicitly if the narrowing is intended")
      c.cast(dt)
    }
  }
}

/** Opaque analyzed-DML command: the closure captured the resolved
  * plans/expressions at rule time, so the analyzer and optimizer see
  * only a leaf command (executed eagerly like every Spark command).
  *
  * The `body` FUNCTION inside a plan node is safe precisely because
  * this is an eagerly-executed Command: it runs once at statement
  * execution and the node is never canonicalized into a plan-cache /
  * exchange-reuse key (closures have identity equality, so two
  * textually-identical statements would never cache-hit anyway). If
  * commands ever became cacheable plan fragments, replace the closure
  * with the captured (plans, expressions) data and rebuild the run in
  * the exec node.
  */
case class GraftDmlCommand(
    verb: String, table: String, body: SparkSession => Unit)
  extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** Driver-side execution of a [[GraftDmlCommand]] — the store verbs
  * it composes are themselves distributed; nothing row-sized touches
  * the driver here.
  */
case class GraftDmlExec(
    verb: String, table: String, activeSession: SparkSession,
    body: SparkSession => Unit)
  extends V2CommandExec with LeafExecNode {
  override def output: Seq[Attribute] = Nil
  override protected def run(): Seq[InternalRow] = { body(activeSession); Nil }
}
