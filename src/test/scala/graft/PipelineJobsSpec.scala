package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable
import graft.pipeline.{HarvestJobs, IngestJob}

class PipelineJobsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IngestJob: end-to-end drop -> versioned lake state, then incremental drop") {
    val dir = Files.createTempDirectory("lake").toString + "/place"
    val lake = new LakeTable(spark, dir, "_id")
    val codes = Map("id" -> "id", "updated" -> "updated", "Ciudad (Adjudicatario)" -> "Adjudicatario/Ciudad")

    // drop 1: two records, one with two versions (same natural key)
    val drop1 = Seq(
      ("url/a", "2024-01-01 10:00:00", "Madrid"),
      ("url/a", "2024-01-02 10:00:00", "Madrid2"),
      ("url/b", "2024-01-01 09:00:00", "Bilbao")
    ).toDF("id", "updated", "Ciudad (Adjudicatario)")
    IngestJob.run(spark, lake, drop1, codes, "id", "updated", group = 0)

    val state1 = lake.read
    val active1 = state1.filter(col("obsolete_version").isNull)
    assert(active1.count() == 2)
    val tomb1 = state1.filter(col("obsolete_version") === true)
    assert(tomb1.count() == 1)
    // tombstone points at url/a's active id
    val aActive = active1.filter(col("id") === "url/a").select("_id").collect().head.getString(0)
    assert(tomb1.select("updated_to").collect().head.getString(0) == aActive)

    // drop 2: a newer version of url/b — id sequence must continue
    val drop2 = Seq(("url/b", "2024-02-01 09:00:00", "Bilbao2"))
      .toDF("id", "updated", "Ciudad (Adjudicatario)")
    IngestJob.run(spark, lake, drop2, codes, "id", "updated", group = 0)
    val state2 = lake.read
    assert(state2.filter(col("obsolete_version").isNull).count() == 2)
    assert(state2.filter(col("obsolete_version") === true).count() == 2)
    val orders = state2.select(graft.core.NtpIds.parseNtpId(col("_id")).as("o"))
      .collect().map(_.getLong(0)).sorted
    assert(orders.toSeq == Seq(0L, 1L, 2L, 3L)) // contiguous, continued watermark
  }

  test("IngestJob.summarize: one GROUPING SETS pass over dims (calc_summary)") {
    val df = Seq(("P", "HIGH"), ("P", "LOW"), ("O", "HIGH")).toDF("status", "prio")
    val got = IngestJob.summarize(spark, df, Seq("status", "prio"))
      .orderBy("status", "prio").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.contains(("(all)", "(all)", 3L)))        // grand total
    assert(got.contains(("P", "(all)", 2L)))            // by status
    assert(got.contains(("(all)", "HIGH", 2L)))         // by prio
  }

  test("HarvestJobs.harvest: melt + range filter + skip lists + scanOnly") {
    val records = Seq(
      ("ntp00000001", "https://h1.es/a.pdf", "https://skip.es/b.pdf"),
      ("ntp00000009", "https://h1.es/c.pdf", null)
    ).toDF("_id", "u1", "u2")
    val scanned = HarvestJobs.harvest(records, "_id", Seq("u1", "u2"),
      idRange = (Some("ntp00000001"), Some("ntp00000005")), scanOnly = true)
    assert(scanned.collect().map(_.getAs[String]("url")).toSet ==
      Set("https://h1.es/a.pdf", "https://skip.es/b.pdf"))
    val fetched = HarvestJobs.harvest(records, "_id", Seq("u1", "u2"),
      skipServers = Set("skip.es"))
    // skip-listed hosts stay in the LEDGER as status=skipped (never
    // fetched) — they used to vanish, so 'attempted' and 'never tried'
    // were indistinguishable in the harvest accounting
    val byUrl = fetched.collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("status")).toMap
    assert(byUrl.keySet ==
      Set("https://h1.es/a.pdf", "https://h1.es/c.pdf", "https://skip.es/b.pdf"))
    assert(byUrl("https://skip.es/b.pdf") == graft.harvest.Fetch.Status.Skipped)
    assert(byUrl("https://h1.es/a.pdf") != graft.harvest.Fetch.Status.Skipped)
  }

  test("cli harvest drives extract -> fetch(stub) -> ledger with a measured per-host delay") {
    val root = java.nio.file.Files.createTempDirectory("cli-harvest").toString
    // 6 URLs on ONE host + 1 skip-listed: with --delay 150 the stub
    // fetch of the shared host must take >= 5 gaps = 750 ms (the
    // reference's per-server politeness, get_documents.py:53)
    val records = (1 to 6).map(i =>
        (f"ntp0000000$i", s"https://one.es/d$i.pdf", null: String)) :+
      (("ntp00000007", "https://bad.es/x.pdf", null: String))
    records.toDF("_id", "u1", "u2").write.parquet(root + "/lake")
    val t0 = System.nanoTime()
    graft.cli.Main.run(spark, "harvest", Array(
      "--lake", root + "/lake", "--url-fields", "u1,u2",
      "--delay", "150", "--skip-servers", "bad.es",
      "--out", root + "/ledger"))
    val wallMs = (System.nanoTime() - t0) / 1000000L
    val ledger = spark.read.parquet(root + "/ledger").collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("status")).toMap
    assert(ledger.size == 7, s"every URL lands in the ledger: ${ledger.keySet}")
    assert(ledger("https://bad.es/x.pdf") == graft.harvest.Fetch.Status.Skipped)
    // the stub deterministically errors hash%50 URLs — fetched is what
    // matters here (Ok or Error, never Skipped/missing)
    assert(ledger.count { case (u, s) => u.startsWith("https://one.es/") &&
      (s == graft.harvest.Fetch.Status.Ok || s == graft.harvest.Fetch.Status.Error) } == 6)
    assert(wallMs >= 750L,
      s"per-host politeness must pace 6 same-host fetches to >= 750 ms, took $wallMs")
  }

  test("HarvestJobs.sync + purgeManifest: range-filtered reconciliation") {
    val origin = Seq("ntp00000001_a.pdf", "ntp00000002_b.pdf", "ntp00000009_z.pdf").toDF("name")
    val dest = Seq("ntp00000002_b.pdf").toDF("name")
    val manifest = HarvestJobs.sync(origin, dest, (Some("ntp00000001"), Some("ntp00000005")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(manifest == Set("ADD" -> "ntp00000001_a.pdf", "KEEP" -> "ntp00000002_b.pdf"))

    val obsolete = Seq("ntp00000002").toDF("ntp_id")
    val purge = HarvestJobs.purgeManifest(origin, obsolete)
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(purge.toSeq == Seq("BACKUP_DELETE" -> "ntp00000002_b.pdf"))
  }

  test("BlobStore + HarvestJobs.purge: real bytes move both directions (K6/K7)") {
    import graft.lake.BlobStore
    val root = Files.createTempDirectory("blobs").toString
    val storage = new BlobStore(spark, root + "/primary")
    val backup = new BlobStore(spark, root + "/backup")

    // K6 single-file API
    storage.store("ntp00000001_a.pdf", "live-doc".getBytes)
    storage.store("ntp00000002_b.pdf", "obsolete-doc".getBytes)
    assert(storage.exists("ntp00000001_a.pdf"))
    assert(new String(storage.read("ntp00000002_b.pdf")) == "obsolete-doc")
    assert(storage.list().count() == 2)

    val listing = Seq("ntp00000001_a.pdf", "ntp00000002_b.pdf").toDF("name")
    val obsolete = Seq("ntp00000002").toDF("ntp_id")

    // dry run: manifest only, bytes untouched
    val dry = HarvestJobs.purge(listing, obsolete, root + "/primary", root + "/backup",
      dryRun = true).collect()
    assert(dry.map(_.getString(1)).toSeq == Seq("DRY_RUN"))
    assert(storage.exists("ntp00000002_b.pdf") && !backup.exists("ntp00000002_b.pdf"))

    // purge: obsolete blob moves to backup (copy verified before delete)
    val moved = HarvestJobs.purge(listing, obsolete, root + "/primary", root + "/backup")
      .collect()
    assert(moved.map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq ==
      Seq(("ntp00000002_b.pdf", "MOVED", true)))
    assert(!storage.exists("ntp00000002_b.pdf"))
    assert(new String(backup.read("ntp00000002_b.pdf")) == "obsolete-doc")
    assert(storage.exists("ntp00000001_a.pdf")) // non-obsolete untouched

    // recover: copy back from backup, backup copy retained
    val rec = HarvestJobs.purge(listing, obsolete, root + "/primary", root + "/backup",
      recover = true).collect()
    assert(rec.map(r => (r.getString(1), r.getBoolean(2))).toSeq == Seq(("COPIED", true)))
    assert(new String(storage.read("ntp00000002_b.pdf")) == "obsolete-doc")
    assert(backup.exists("ntp00000002_b.pdf"))

    // a missing blob reports ok=false without failing the job
    val bad = BlobStore.moveAll(Seq("nope.pdf").toDF("name"),
      "name", root + "/primary", root + "/backup", deleteSrc = true).collect()
    assert(!bad.head.getBoolean(2) && bad.head.getString(1).startsWith("ERROR:"))
  }
}
