package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.Entities
import graft.harvest.StorageSync
import graft.ingest.{ColumnMapping, Normalize}

class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fallbackName: strip prefix, underscores, X_(Y) -> Y/X, unidecode (F5)") {
    assert(ColumnMapping.fallbackName("ContractFolderStatus - Tender Result") == "Tender_Result")
    assert(ColumnMapping.fallbackName("Ciudad (Adjudicatario)") == "Adjudicatario/Ciudad")
    assert(ColumnMapping.fallbackName("Clasificación CPV") == "Clasificacion_CPV")
  }

  test("applyMapping renames known columns and falls back for unknown (S3)") {
    val df = Seq((1, "x", "y")).toDF("id", "Ciudad (Adjudicatario)", "Nueva Columna")
    val out = ColumnMapping.applyMapping(df, Map("id" -> "_id"))
    assert(out.columns.toSeq == Seq("_id", "Adjudicatario/Ciudad", "Nueva_Columna"))
  }

  test("parseListString: quoted list via from_json, scalar passthrough (F7)") {
    val df = Seq("['45000000','45210000']", "plain").toDF("s")
      .select(Normalize.parseListString(col("s")).as("v"))
    val vs = df.collect().map(_.getAs[scala.collection.Seq[String]]("v"))
    assert(vs(0) == Seq("45000000", "45210000"))
    assert(vs(1) == Seq("plain"))
  }

  test("nullToEmpty and unwrapSingle (F8, list unwrap)") {
    val df = Seq((null: String, Seq("only")), ("x", Seq("a", "b"))).toDF("s", "l")
      .select(Normalize.nullToEmpty(col("s")).as("s"), Normalize.unwrapSingle(col("l")).as("u"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "")
    assert(rows(0).getString(1) == "only")
    assert(rows(1).getString(1) != "a") // multi-element stays array-ish (stringified)
  }

  test("normalizeDrop: collisions, list parse+unwrap, extra residue map (parse_parquet)") {
    val codes = Map("id" -> "id", "updated" -> "updated",
      "Ciudad (Adjudicatario)" -> "lugar", "Localidad" -> "lugar")
    val df = Seq(
      ("url/a", "2024-01-01 10:00:00", "Madrid", null: String,
        Seq("['45000000','45210000']"), Seq("solo"), "v1"),
      ("url/b", "2024-01-02 10:00:00", null: String, "Bilbao",
        Seq("plain", "['x']"), Seq("a", "b"), null: String)
    ).toDF("id", "updated", "Ciudad (Adjudicatario)", "Localidad",
      "cpv_list", "single_list", "Nueva Columna - X")
    // cpv_list/single_list are unknown too? no — make them known targets
    val out = Normalize.normalizeDrop(df,
      codes ++ Map("cpv_list" -> "cpv", "single_list" -> "nota"))
      .orderBy("id").collect()

    // collision: both sources land on `lugar` as an array, nulls (as '')
    // kept per-source... array_compact only drops SQL nulls, '' survives
    val r0 = out(0)
    assert(r0.getAs[scala.collection.Seq[String]]("lugar") == Seq("Madrid", ""))
    // string-encoded list inside an array cell parses + flattens to JSON
    assert(r0.getAs[String]("cpv") == """["45000000","45210000"]""")
    // single-element list unwraps to the scalar
    assert(r0.getAs[String]("nota") == "solo")
    // unknown column lands in the residue map under its fallback name
    assert(r0.getAs[Map[String, String]]("extra") == Map("Nueva_Columna_X" -> "v1"))
    val r1 = out(1)
    assert(r1.getAs[scala.collection.Seq[String]]("lugar") == Seq("", "Bilbao"))
    assert(r1.getAs[String]("cpv") == """["plain","x"]""")
    assert(r1.getAs[String]("nota") == """["a","b"]""")
    assert(r1.getAs[Map[String, String]]("extra") == Map("Nueva_Columna_X" -> ""))
  }

  test("entity id normalization + classification (F14)") {
    val df = Seq("12345678-z", "a1234567.c", "x 1234567l", "garbage").toDF("raw")
      .select(Entities.classifyId(Entities.normalizeId(col("raw"))).as("t"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("DNI", "CIF", "NIE", "INVALID"))
  }

  test("fixContracterIds re-joins single-char lists (F22)") {
    val df = Seq(Seq("A", "1", "2", "3"), Seq("A123", "B456")).toDF("ids")
      .select(Entities.fixContracterIds(col("ids")).as("f"))
    val rows = df.collect().map(_.getAs[scala.collection.Seq[String]]("f"))
    assert(rows(0) == Seq("A123"))
    assert(rows(1) == Seq("A123", "B456"))
  }

  test("nestSlashColumns groups A/B columns into structs (§1.4)") {
    val df = Seq((1, "Madrid", "B123", "x")).toDF(
      "id", "Adjudicatario/Ciudad", "Adjudicatario/NIF", "plain")
    val out = ColumnMapping.nestSlashColumns(df)
    assert(out.columns.toSeq == Seq("id", "plain", "Adjudicatario"))
    val r = out.select("Adjudicatario.Ciudad", "Adjudicatario.NIF").collect().head
    assert(r.getString(0) == "Madrid" && r.getString(1) == "B123")
  }

  test("BulkWriter batches side-effect flushes per partition (K2)") {
    val df = (1 to 25).toDF("v").repartition(2)
    val seen = TestSpark.spark.sparkContext.collectionAccumulator[Int]("batch_sizes")
    val flushes = graft.lake.BulkWriter.writeBatched(df, batchSize = 10) { rows =>
      seen.add(rows.length)
    }
    assert(flushes >= 3)  // 25 rows / batch 10 across 2 partitions
    val sizes = seen.value
    assert(sizes.size.toLong == flushes)
    var total = 0; sizes.forEach(n => total += n)
    assert(total == 25)
    assert(sizes.stream.allMatch(_ <= 10))
  }

  test("cli.Main: ingest then summary end-to-end on temp dirs (§7.7)") {
    val tmp = java.nio.file.Files.createTempDirectory("cli").toString
    val drop = tmp + "/drop.parquet"
    Seq(("url/a", "2024-01-01 10:00:00", "P"), ("url/b", "2024-01-02 10:00:00", "O"))
      .toDF("id", "updated", "status").write.parquet(drop)
    graft.cli.Main.run(spark, "ingest", Array("--in", drop, "--lake", tmp + "/lake"))
    assert(spark.read.parquet(tmp + "/lake").count() == 2)
    graft.cli.Main.run(spark, "summary",
      Array("--lake", tmp + "/lake", "--dims", "status", "--out", tmp + "/sum"))
    val sum = spark.read.parquet(tmp + "/sum")
    assert(sum.filter(col("status") === "(all)").collect().head.getAs[Long]("n") == 2L)
  }

  test("cli.Main: --audit-gate refuses a retyped drop, diff printed") {
    val tmp = java.nio.file.Files.createTempDirectory("cli_gate").toString
    val drop1 = tmp + "/drop1.parquet"
    Seq(("url/a", "2024-01-01 10:00:00", 10L))
      .toDF("id", "updated", "amount").write.parquet(drop1)
    graft.cli.Main.run(spark, "ingest",
      Array("--in", drop1, "--lake", tmp + "/lake", "--audit-gate"))
    assert(spark.read.parquet(tmp + "/lake").count() == 1)

    // drop 2 retypes amount bigint -> double: refused, lake untouched
    val drop2 = tmp + "/drop2.parquet"
    Seq(("url/b", "2024-01-02 10:00:00", 11.5))
      .toDF("id", "updated", "amount").write.parquet(drop2)
    val e = intercept[RuntimeException](graft.cli.Main.run(spark, "ingest",
      Array("--in", drop2, "--lake", tmp + "/lake", "--audit-gate")))
    assert(e.getMessage.contains("audit-gate"))
    assert(spark.read.parquet(tmp + "/lake").count() == 1, "refused run must not land")

    // same-typed and added-column drops pass the gate
    val drop3 = tmp + "/drop3.parquet"
    Seq(("url/c", "2024-01-03 10:00:00", 12L, "new"))
      .toDF("id", "updated", "amount", "note").write.parquet(drop3)
    graft.cli.Main.run(spark, "ingest",
      Array("--in", drop3, "--lake", tmp + "/lake", "--audit-gate"))
    assert(spark.read.parquet(tmp + "/lake").count() == 2)
  }

  test("cli.Main: cluster + index operate a lake end-to-end") {
    val tmp = java.nio.file.Files.createTempDirectory("cli-idx").toString
    spark.range(5000).select(
      concat(lit("k"), col("id")).as("_id"),
      pmod(hash(col("id"), lit(5)), lit(65536)).cast("long").as("a"),
      pmod(hash(col("id"), lit(6)), lit(65536)).cast("long").as("b"))
      .repartition(8).write.parquet(tmp + "/lake")
    graft.cli.Main.run(spark, "cluster", Array("--lake", tmp + "/lake",
      "--by", "a,b", "--target-bytes", "20000"))
    assert(spark.read.parquet(tmp + "/lake").count() == 5000)
    graft.cli.Main.run(spark, "index", Array("--lake", tmp + "/lake"))
    assert(spark.read.parquet(tmp + "/lake.bloomidx").count() ==
      spark.read.parquet(tmp + "/lake").inputFiles.length.toLong)
    graft.cli.Main.run(spark, "index", Array("--lake", tmp + "/lake", "--refresh"))
    graft.cli.Main.run(spark, "index", Array("--lake", tmp + "/lake", "--get", "k42"))
  }

  test("cli.Main: index --kind minhash|ivf operate the persisted probe tiers") {
    val tmp = java.nio.file.Files.createTempDirectory("cli-idx2").toString
    Seq((1L, "the quick brown fox jumps over the dog"),
        (2L, "the quick brown fox jumps over the cat"),
        (3L, "something else entirely different here"))
      .toDF("doc_id", "text").write.parquet(tmp + "/docs")
    graft.cli.Main.run(spark, "index",
      Array("--kind", "minhash", "--lake", tmp + "/docs"))
    assert(spark.read.parquet(tmp + "/docs.bandidx").select("doc").distinct().count() == 3)
    graft.cli.Main.run(spark, "index",
      Array("--kind", "minhash", "--lake", tmp + "/docs", "--refresh"))
    graft.cli.Main.run(spark, "index",
      Array("--kind", "minhash", "--lake", tmp + "/docs", "--pairs"))

    Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding").write.parquet(tmp + "/emb")
    graft.cli.Main.run(spark, "index",
      Array("--kind", "ivf", "--lake", tmp + "/emb", "--nlist", "2"))
    assert(spark.read.parquet(tmp + "/emb.ivfidx/lists").count() == 3)
    graft.cli.Main.run(spark, "index",
      Array("--kind", "ivf", "--lake", tmp + "/emb", "--refresh"))
    graft.cli.Main.run(spark, "index",
      Array("--kind", "pq", "--lake", tmp + "/emb", "--nlist", "2",
        "--msub", "2", "--ks", "4"))
    assert(spark.read.parquet(tmp + "/emb.pqidx/lists").count() == 3)
    graft.cli.Main.run(spark, "index",
      Array("--kind", "pq", "--lake", tmp + "/emb", "--refresh"))
  }

  test("cli.Main: curate lands a deduped, decontaminated, packed, shard-partitioned corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("cli-curate").toString
    // two near-identical docs (one survives), one eval-contaminated doc,
    // one low-quality doc, one clean keeper — per source shard
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val docs = Seq(
      (1L, base + " one", "s0"),
      (2L, base + " two", "s0"),                       // near-dup of 1 -> dropped
      (3L, "completely different clean text about the data engine for the tests", "s0"),
      (4L, "zz qq xx", "s0"),                          // low quality -> dropped
      (5L, "the secret benchmark question appears here word for word in the corpus today", "s1")
    ).toDF("doc_id", "text", "source")
    docs.write.parquet(tmp + "/docs")
    Seq((100L, "the secret benchmark question appears here word for word in the corpus today"))
      .toDF("doc_id", "text").write.parquet(tmp + "/eval")
    graft.cli.Main.run(spark, "curate", Array(
      "--in", tmp + "/docs", "--out", tmp + "/out", "--eval", tmp + "/eval",
      "--min-shared", "3", "--min-quality", "0.4", "--budget", "64"))
    val out = spark.read.parquet(tmp + "/out")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(3L) && !ids.contains(4L) && !ids.contains(5L))
    assert((ids & Set(1L, 2L)).size == 1)              // one canonical survivor
    assert(out.columns.contains("bin") && out.columns.contains("offset")
      && out.columns.contains("text") && out.columns.contains("source"))
    // landed shard-partitioned: source=<shard> dirs on disk
    val dirs = new java.io.File(tmp + "/out").listFiles().map(_.getName).filter(_.startsWith("source="))
    assert(dirs.nonEmpty)
  }

  test("cli.Main: ingest reopens an existing lake with ITS bucket modulus (layout marker)") {
    val tmp = java.nio.file.Files.createTempDirectory("cli-layout").toString
    val codes = Map("id" -> "id", "updated" -> "updated", "title" -> "title")
    // lake created programmatically with a NON-default modulus
    val lake8 = new graft.lake.LakeTable(spark, tmp + "/lake", "_id",
      graft.pipeline.IngestJob.LakePartitionCols, nBuckets = 8)
    val drop1 = Seq(("url/k1", "2024-01-01 10:00:00", "t1"),
      ("url/k2", "2024-01-01 10:00:00", "t2")).toDF("id", "updated", "title")
    graft.pipeline.IngestJob.run(spark, lake8, drop1, codes, "id", "updated", 0)
    // re-delivery of k1 through the CLI: a writer assuming the default
    // 1024 modulus would look in the wrong bucket, classify it fresh,
    // and duplicate the active version — the marker prevents that
    val drop2 = tmp + "/drop2.parquet"
    Seq(("url/k1", "2024-02-01 10:00:00", "t1v2")).toDF("id", "updated", "title")
      .write.parquet(drop2)
    graft.cli.Main.run(spark, "ingest", Array("--in", drop2, "--lake", tmp + "/lake"))
    val active = spark.read.parquet(tmp + "/lake")
      .filter(col("obsolete_version").isNull)
    assert(active.count() == 2) // still one active row per key — no duplication
    assert(active.filter(col("id") === "url/k1").count() == 1)
    // k1's timeline absorbed the re-delivery (overlap-merge ran, not a fresh insert)
    val k1 = active.filter(col("id") === "url/k1").collect().head
    assert(k1.getAs[String]("title") == "t1v2")
    // and the bucket values still obey the ORIGINAL modulus
    assert(spark.read.parquet(tmp + "/lake")
      .filter(col("bucket") =!= pmod(hash(col("id")), lit(8))).count() == 0)
  }

  test("cli.Main: purge moves obsolete blobs to backup, recover restores (K7 §7.7)") {
    val tmp = java.nio.file.Files.createTempDirectory("cli-purge").toString
    // lake with one active and one obsolete version
    Seq(("ntp00000001", null.asInstanceOf[java.lang.Boolean]),
        ("ntp00000002", java.lang.Boolean.TRUE))
      .toDF("_id", "obsolete_version").write.parquet(tmp + "/lake")
    // blob store: one file per id
    val store = new graft.lake.BlobStore(spark, tmp + "/storage")
    store.store("ntp00000001_doc.pdf", "keep".getBytes)
    store.store("ntp00000002_doc.pdf", "purge".getBytes)
    graft.cli.Main.run(spark, "purge", Array("--lake", tmp + "/lake",
      "--storage", tmp + "/storage", "--backup", tmp + "/backup"))
    assert(store.exists("ntp00000001_doc.pdf"))      // active blob untouched
    assert(!store.exists("ntp00000002_doc.pdf"))     // obsolete moved out
    val backup = new graft.lake.BlobStore(spark, tmp + "/backup")
    assert(new String(backup.read("ntp00000002_doc.pdf")) == "purge")
    // recover copies it back (backup kept)
    graft.cli.Main.run(spark, "purge", Array("--lake", tmp + "/lake",
      "--storage", tmp + "/storage", "--backup", tmp + "/backup", "--recover_backup"))
    assert(new String(store.read("ntp00000002_doc.pdf")) == "purge")
    assert(backup.exists("ntp00000002_doc.pdf"))
  }

  test("StorageSync.reconcile: ADD/DEL/KEEP partition of listings (X1-X3)") {
    val origin = Seq("a.pdf", "b.pdf", "c.pdf").toDF("name")
    val dest = Seq("b.pdf", "d.pdf").toDF("name")
    val ops = StorageSync.reconcile(origin, dest).collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    assert(ops == Set("ADD" -> "a.pdf", "ADD" -> "c.pdf", "KEEP" -> "b.pdf", "DEL" -> "d.pdf"))
  }
}
