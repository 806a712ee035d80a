package graft.ingest

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import graft.store.{SqliteCompat, TableStore}

/** Port of `/root/reference/tests/test_import.py`: zip-of-.js →
  * archive_* tables with golden rows, drop-and-recreate semantics,
  * file-subset imports, hash_id pks.
  */
class ArchiveSpec extends SparkSpec {

  private def zipContentsDir = new File(resource("zip_contents"))

  private def makeZip(): String = {
    val out = File.createTempFile("archive", ".zip")
    val zos = new ZipOutputStream(new FileOutputStream(out))
    zipContentsDir.listFiles.sortBy(_.getName).foreach { f =>
      zos.putNextEntry(new ZipEntry(f.getName))
      zos.write(java.nio.file.Files.readAllBytes(f.toPath))
      zos.closeEntry()
    }
    zos.close()
    out.getAbsolutePath
  }

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-archive").toString)

  test("import zip: five tables, golden rows (test_import.py:39-46, 73-108)") {
    val store = freshStore()
    Archive.importPath(spark, store, makeZip())
    assert(store.tableNames.toSet === Set(
      "archive_follower", "archive_saved_search", "archive_account",
      "archive_app", "archive_following"))

    assert(store.read("archive_follower").collect()
      .map(_.getAs[String]("accountId")).toSet === Set("73747798", "386025404"))
    assert(store.read("archive_following").collect()
      .map(_.getAs[String]("accountId")).toSet === Set("547842573", "12158"))

    // appNames survives as native array; compat-renders to the golden text
    val app = SqliteCompat.render(store.read("archive_app")).collect()(0)
    assert(app.getAs[String]("appId") === "1380676511")
    assert(app.getAs[String]("appNames") === """["BBC Sounds"]""")

    val searches = store.read("archive_saved_search").collect()
      .map(r => (r.getAs[String]("savedSearchId"), r.getAs[String]("query"))).toSet
    assert(searches === Set(("42214", "simonw"), ("55814", "django")))

    // hash_id pk over all columns, byte-exact golden (test_import.py:99)
    val account = store.read("archive_account").collect()(0)
    assert(account.getAs[String]("pk") === "c4e32e91742df2331ef3ad1e481d1a64d781183a")
    assert(account.getAs[String]("phoneNumber") === "+15555555555")
    assert(account.getAs[String]("accountId") === "12497")

    // empty account-suspension.js produced no table
    assert(!store.exists("archive_account_suspension"))
  }

  test("import directory gives the same result (test_import.py:48-53)") {
    val store = freshStore()
    Archive.importPath(spark, store, zipContentsDir.getAbsolutePath)
    assert(store.tableNames.size === 5)
  }

  test("import specific files only (test_import.py:56-70)") {
    val store = freshStore()
    Archive.importPath(spark, store, resource("zip_contents/follower.js"))
    Archive.importPath(spark, store, resource("zip_contents/following.js"))
    assert(store.tableNames === Seq("archive_follower", "archive_following"))
  }

  test("drop-and-recreate on reimport (test_import.py:111-131)") {
    import spark.implicits._
    val store = freshStore()
    // pre-existing archive_follower with a different schema
    store.overwrite("archive_follower", Seq((1L, "junk")).toDF("id", "junk"))
    Archive.importPath(spark, store, makeZip())
    val cols = store.read("archive_follower").columns.toSet
    assert(cols === Set("accountId"))
    assert(store.read("archive_follower").count() === 2)
  }

  test("unknown file prints notice and creates nothing; manifest ignored") {
    val store = freshStore()
    val imported = Archive.importFromFile(spark, store, "mystery-file.js",
      """window.YTD.mystery_file.part0 = [{"x": {"a": 1}}]""")
    assert(imported.isEmpty)
    val ignored = Archive.importFromFile(spark, store, "manifest.js",
      """window.YTD.manifest.part0 = [{"x": {"a": 1}}]""")
    assert(ignored.isEmpty)
    assert(store.tableNames.isEmpty)
  }

  test("archive tweet transformer: envelope unwrap, id casts, optional nulls") {
    val store = freshStore()
    val content =
      """window.YTD.tweet.part0 = [
        |{"tweet": {"id": "1169242008432644097", "full_text": "hi",
        |  "in_reply_to_status_id": "123", "retweet_count": "2"}},
        |{"tweet": {"id": "1169246717864136705", "full_text": "yo",
        |  "in_reply_to_status_id": null, "retweet_count": "0"}}
        |]""".stripMargin
    Archive.importFromFile(spark, store, "tweet.js", content)
    val rows = store.read("archive_tweet").orderBy("id").collect()
    assert(rows.length === 2)
    // string ids cast to long, exact beyond 2^53
    assert(rows(0).getAs[Long]("id") === 1169242008432644097L)
    assert(rows(0).getAs[Long]("in_reply_to_status_id") === 123L)
    assert(rows(1).getAs[Long]("id") === 1169246717864136705L)
    // optional columns default-null
    val cols = rows(0).schema.fieldNames.toSet
    assert(Set("possibly_sensitive", "coordinates", "geo", "extended_entities")
      .subsetOf(cols))
  }

  test("lists-* url parsing (archive.py:213-226)") {
    val store = freshStore()
    val content =
      """window.YTD.lists_member.part0 = [
        |{"userListInfo": {"urls": ["https://twitter.com/simonw/lists/datasette"]}},
        |{"userListInfo": {"url": "https://twitter.com/natbat/lists/owls"}}
        |]""".stripMargin
    Archive.importFromFile(spark, store, "lists-member.js", content)
    val rows = store.read("archive_lists_member").collect()
      .map(r => (r.getAs[String]("screen_name"), r.getAs[String]("list_slug"))).toSet
    assert(rows === Set(("simonw", "datasette"), ("natbat", "owls")))
  }

  test("ni-devices category pivot (archive.py:131-140)") {
    val store = freshStore()
    val content =
      """window.YTD.ni_devices.part0 = [
        |{"niDeviceResponse": {"messagingDevice": {"carrier": "xx", "deviceType": "Sms"}}},
        |{"niDeviceResponse": {"web": {"agent": "Mozilla"}}}
        |]""".stripMargin
    Archive.importFromFile(spark, store, "ni-devices.js", content)
    // the reference writes table "ne-devices" (its typo, its name)
    val rows = store.read("archive_ne_devices").collect()
    assert(rows.map(_.getAs[String]("category")).toSet === Set("messagingDevice", "web"))
    // one row per block, first category only (list(block.keys())[0]):
    // a two-category block contributes a single row
    assert(rows.length === 2)
  }

  test("re-import drops the pre-rename archive_ni_devices table") {
    // earlier versions of this repo wrote the corrected name; a store
    // carrying it must not keep an orphan beside the reference-parity
    // archive_ne_devices after a re-import
    val store = freshStore()
    import spark.implicits._
    store.overwrite("archive_ni_devices",
      Seq(("old", "row")).toDF("category", "agent"))
    val content =
      """window.YTD.ni_devices.part0 = [
        |{"niDeviceResponse": {"web": {"agent": "Mozilla"}}}
        |]""".stripMargin
    Archive.importFromFile(spark, store, "ni-devices.js", content)
    assert(!store.exists("archive_ni_devices"))
    assert(store.read("archive_ne_devices").count() === 1)
  }

  test("empty re-import migrates old ni_devices rows instead of losing them") {
    val store = freshStore()
    import spark.implicits._
    store.overwrite("archive_ni_devices",
      Seq(("old", "row")).toDF("category", "agent"))
    Archive.importFromFile(spark, store, "ni-devices.js",
      "window.YTD.ni_devices.part0 = []")
    assert(!store.exists("archive_ni_devices"))
    val rows = store.read("archive_ne_devices").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("category") === "old")
  }

  test("personalization multi-output fan-out (archive.py:147-180)") {
    val store = freshStore()
    val content =
      """window.YTD.personalization.part0 = [{"p13nData": {
        |  "demographics": {"languages": [{"language": "English", "isDisabled": false}],
        |                   "genderInfo": {"gender": "male"}},
        |  "interests": {"interests": [{"name": "Python", "isDisabled": false}],
        |                "partnerInterests": [],
        |                "audienceAndAdvertisers": {"advertisers": ["@ACLU"], "numAudiences": "43"},
        |                "shows": ["Doctor Who"]},
        |  "locationHistory": ["San Francisco"],
        |  "inferredAgeInfo": {"age": ["13-54"], "birthDate": ""}
        |}}]""".stripMargin
    Archive.importFromFile(spark, store, "personalization.js", content)
    val names = store.tableNames
    assert(names.contains("archive_personalization_interests"))
    assert(names.contains("archive_personalization_demographics_languages"))
    assert(names.contains("archive_personalization_advertisers"))
    assert(names.contains("archive_personalization_shows"))
    assert(names.contains("archive_personalization_locationHistory"))
    assert(names.contains("archive_personalization_inferredAgeInfo"))
    assert(store.read("archive_personalization_shows").collect()
      .map(_.getAs[String]("name")).toSeq === Seq("Doctor Who"))
    assert(store.read("archive_personalization_interests").collect()(0)
      .getAs[String]("name") === "Python")
  }

  test("distributed zip scan matches the driver-side walk, archive-tagged") {
    // two zips in one dir (one with a nested dir + assets/ member the
    // member rules must skip), read via the binaryFile path — every
    // (file, content) the per-archive driver walk yields, same rules
    val dir = java.nio.file.Files.createTempDirectory("graft-zips").toFile
    def writeZip(name: String, entries: Seq[(String, String)]): File = {
      val f = new File(dir, name)
      val zos = new ZipOutputStream(new FileOutputStream(f))
      entries.foreach { case (n, c) =>
        zos.putNextEntry(new ZipEntry(n))
        zos.write(c.getBytes("UTF-8"))
        zos.closeEntry()
      }
      zos.close()
      f
    }
    val z1 = writeZip("a.zip", Seq(
      "follower.js" -> "window.YTD.follower.part0 = []",
      "assets/skip.js" -> "nope",
      "data/app.js" -> "window.YTD.app.part0 = [{\"x\": 1}]",
      "readme.txt" -> "not js"))
    val z2 = writeZip("b.zip", Seq(
      "following.js" -> "window.YTD.following.part0 = [\"ü\"]"))

    val got = Archive
      .readArchiveZipsDistributed(spark, dir.getAbsolutePath + "/*.zip")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = Seq(z1, z2).flatMap { z =>
      Archive.readArchiveZip(z.getAbsolutePath)
        .map { case (n, c) => (z.getName, n, c) }
    }.toSet
    assert(got === want)
    assert(got.map(_._2) === Set("follower.js", "app.js", "following.js"))
  }

  test("distributed zip scan streams many-member archives; empty glob is empty") {
    // the streamed path (FileSystem.open → ZipInputStream, one member
    // at a time — never the whole archive as a row) must yield exactly
    // the driver walk on a many-member archive
    val dir = java.nio.file.Files.createTempDirectory("graft-zips-m").toFile
    val f = new File(dir, "big.zip")
    val zos = new ZipOutputStream(new FileOutputStream(f))
    (0 until 100).foreach { i =>
      zos.putNextEntry(new ZipEntry(s"part$i.js"))
      zos.write(s"""window.YTD.t$i.part0 = [{"i": $i}]""".getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.putNextEntry(new ZipEntry("assets/no.js")); zos.write("x".getBytes); zos.closeEntry()
    zos.close()
    val got = Archive
      .readArchiveZipsDistributed(spark, dir.getAbsolutePath + "/*.zip")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    val want = Archive.readArchiveZip(f.getAbsolutePath).toSet
    assert(got === want)
    assert(got.size === 100)
    // a glob matching nothing returns an empty frame, not a crash
    assert(Archive.readArchiveZipsDistributed(
      spark, dir.getAbsolutePath + "/nope-*.zip").count() === 0L)
  }
}
