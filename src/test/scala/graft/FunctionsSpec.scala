package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, UnidecodeEs}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("UnidecodeEs: native expression transliterates es accents, null-safe") {
    val df = Seq("Clasificación CPV", "Año único", "plain ascii", null)
      .toDF("s").select(UnidecodeEs.unidecode_es(col("s")).as("p"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("Clasificacion CPV", "Ano unico", "plain ascii", null))
  }

  test("UnidecodeEs participates in codegen (no CodegenFallback)") {
    val df = Seq("Canción").toDF("s").select(UnidecodeEs.unidecode_es(col("s")).as("p"))
    // force both paths: interpreted eval and generated code agree
    val interpreted = UnidecodeEs.transliterate("Canción")
    assert(df.collect().head.getString(0) == interpreted)
    assert(interpreted == "Cancion")
  }

  test("two dot_float instances in one projection stay codegen'd and correct") {
    import graft.functions.DotFloat.dot_float
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array(0.5f, 0.5f)))
      .toDF("a", "b", "c")
      .repartition(1) // keep the projection at runtime (no constant-fold to LocalTableScan)
      .select(dot_float(col("a"), col("b")).as("ab"), dot_float(col("a"), col("c")).as("ac"))
    val r = df.collect().head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 1.5)
    // pre-freshName, the second instance collided on fixed identifiers and
    // silently fell back to interpreted eval; with freshName both compile
    // (plan inspected post-collect so AQE has finalized it; '*(n)' marks a
    // WholeStageCodegen span in the tree string)
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }

  test("native MinHashSig / SimHashBits match the interpreted HOF forms") {
    import graft.ops.{Dedup, TextAnalysis}
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs", "sphinx of black quartz judge my vow")
    val df = texts.toDF("text").withColumn("sh", Dedup.shingles(col("text")))
    // HOF reference formulation, inlined (the production path is native)
    val hofSig = aggregate(col("sh"), array_repeat(lit("~"), 8),
      (acc, s) => zip_with(acc,
        array((0 until 8).map(i => md5(concat(lit(s"$i|"), s))): _*),
        (a, h) => least(a, h)))
    val sig = df.select(Dedup.minhashSignature(col("sh"), 8).as("n"), hofSig.as("h")).collect()
    sig.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    val hofBits = {
      val hs = transform(TextAnalysis.tokens(col("text")), t => substring(md5(t), 1, 16))
      val votes = aggregate(hs, array_repeat(lit(0L), 64),
        (acc, h) => zip_with(acc, sequence(lit(0), lit(63)), (a, b) => {
          val hexPos = (b / 4).cast("int") + 1
          val mask = element_at(array(lit(8), lit(4), lit(2), lit(1)), pmod(b, lit(4)).cast("int") + 1)
          a + when((instr(lit("0123456789abcdef"), h.substr(hexPos, lit(1))) - 1)
            .bitwiseAND(mask) > 0, lit(1L)).otherwise(lit(-1L))
        }))
      array_join(transform(votes, v => when(v > 0, lit("1")).otherwise(lit("0"))), "")
    }
    val bits = df.select(Dedup.simhashBits(col("text")).as("n"), hofBits.as("h")).collect()
    bits.foreach(r => assert(r.getString(0) == r.getString(1)))
    // empty-input identities
    val empty = Seq("").toDF("text")
      .select(Dedup.minhashSignature(Dedup.shingles(col("text")), 4).as("sig"),
        Dedup.simhashBits(col("text")).as("bits")).collect().head
    assert(empty.getSeq[String](0) == Seq("~", "~", "~", "~"))
    assert(empty.getString(1) == "0" * 64)
  }

  test("DeflateLen: repetitive text compresses far below near-random text; ratio envelope") {
    import graft.functions.Compress
    import graft.ops.TextAnalysis
    val repetitive = "the cat sat on the mat " * 50                       // ~1.1 KB, one phrase
    val mixed = (0 until 200).map(i => s"w${i * 7919 % 997}").mkString(" ") // varied tokens
    val df = Seq(("rep", repetitive), ("mix", mixed), ("empty", ""))
      .toDF("k", "text")
      .select(col("k"), Compress.deflate_len(col("text")).as("dl"),
        TextAnalysis.compressRatioPct(col("text")).as("pct"))
    val got = df.collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    val (repDl, repPct) = got("rep")
    val (mixDl, mixPct) = got("mix")
    val (emptyDl, emptyPct) = got("empty")
    assert(repDl > 0 && mixDl > 0)
    assert(repPct < 15, s"repeated phrase must compress hard, got $repPct%")
    assert(mixPct > repPct * 3, s"varied text ($mixPct%) must compress far worse than boilerplate ($repPct%)")
    assert(emptyPct == 100L && emptyDl >= 0, "empty text pins ratio at 100")
    // deterministic: same input, same JVM, same stream length
    assert(df.collect().map(r => r.getInt(1)).toSeq == Seq(repDl, mixDl, emptyDl))
    // null-safe
    assert(Seq[String](null).toDF("text")
      .select(Compress.deflate_len(col("text"))).collect().head.isNullAt(0))
    // multi-byte text: the ratio denominates in UTF-8 BYTES (octet_length),
    // matching what the deflater consumes — ratio stays <= ~100 for text
    // that would exceed it if char-counted
    val utf8 = Seq("ñandú ñandú ñandú €€€ 👍👍").toDF("text")
      .select(TextAnalysis.compressRatioPct(col("text"))).collect().head.getLong(0)
    assert(utf8 > 0 && utf8 <= 110, s"byte-based ratio out of envelope: $utf8")
  }

  test("nfc_normalize composes combining marks, passes ASCII untouched, null-safe, SQL == Column API") {
    import graft.functions.NfcNormalize
    // "e" + U+0301 -> "é"; ASCII hits the isNormalized fast path
    val df = Seq("Jose\u0301 nin\u0303o", "plain ascii", null)
      .toDF("s").select(NfcNormalize.nfc_normalize(col("s")).as("n"))
    val got = df.collect()
    assert(got(0).getString(0) == "Jos\u00e9 ni\u00f1o")
    assert(got(1).getString(0) == "plain ascii")
    assert(got(2).isNullAt(0))
    // different raw bytes, same md5 AFTER normalization — the dedup story
    val hashes = Seq(("Jose\u0301", "Jos\u00e9")).toDF("a", "b")
      .select(md5(NfcNormalize.nfc_normalize(col("a"))).as("ha"),
        md5(NfcNormalize.nfc_normalize(col("b"))).as("hb"),
        (md5(col("a")) =!= md5(col("b"))).as("raw_differs")).collect().head
    assert(hashes.getString(0) == hashes.getString(1) && hashes.getBoolean(2))
    GraftExtensions.registerAll(spark)
    // NB: Spark's chr() is ASCII-only (n % 256), unlike DuckDB's
    // codepoint chr — embed the combining mark in the SQL text itself
    assert(spark.sql("SELECT nfc_normalize('Jose\u0301') AS n")
      .collect().head.getString(0) == "Jos\u00e9")
  }

  test("the whole native inventory is callable from SQL and matches the Column API") {
    // the suite shares one SparkSession, and withExtensions is ignored by
    // getOrCreate on an existing session — registerAll targets the live
    // registry with the same builders GraftExtensions injects
    GraftExtensions.registerAll(spark)
    assert(spark.sql("SELECT unidecode_es('Señor Müller') AS p")
      .collect().head.getString(0) == "Senor Muller")

    val row = spark.sql(
      """SELECT dot_float(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       dot_byte_float(array(CAST(-128 AS TINYINT), CAST(127 AS TINYINT)),
        |                      array(1.0F, 1.0F)) AS db,
        |       minhash_sig(array('a b c', 'b c d'), 2) AS mh,
        |       simhash_bits(array('x', 'y')) AS sh,
        |       rolling_hash(array('x', 'y')) AS rh,
        |       stopword_count(array('the', 'cat', 'the'), array('the', 'a')) AS sw,
        |       deflate_len('aaaaaaaaaaaaaaaaaaaaaaaa') AS dfl
        |""".stripMargin).collect().head
    // cross-check each against the Column-API form on the same inputs
    import graft.functions.TextHashes
    val colRow = Seq(1).toDF("one").select(
      graft.functions.DotFloat.dot_float(
        array(lit(1.0f), lit(2.0f)), array(lit(3.0f), lit(4.0f))).as("d"),
      TextHashes.minhash_signature(array(lit("a b c"), lit("b c d")), 2).as("mh"),
      TextHashes.simhash_bits(array(lit("x"), lit("y"))).as("sh"),
      TextHashes.rolling_hash(array(lit("x"), lit("y"))).as("rh"),
      TextHashes.stopword_count(array(lit("the"), lit("cat"), lit("the")),
        Seq("the", "a")).as("sw")).collect().head
    assert(row.getDouble(0) == colRow.getDouble(0))
    // the kernel's raw sum form: sum((code + 128) * q) = (0)*1 + (255)*1
    assert(row.getDouble(1) == 255.0)
    assert(row.getSeq[String](2) == colRow.getSeq[String](1))
    assert(row.getString(3) == colRow.getString(2))
    assert(row.getLong(4) == colRow.getLong(3))
    assert(row.getInt(5) == colRow.getInt(4))
    assert(row.getInt(6) == Seq(1).toDF("one")
      .select(graft.functions.Compress.deflate_len(lit("a" * 24))).collect().head.getInt(0))
    // literal-shape misuse fails loudly, not silently
    val e = intercept[Exception](spark.sql("SELECT minhash_sig(array('x'), 'two')").collect())
    assert(e.getMessage.contains("integer literal") || e.getCause != null)
    // a NULL inside the word-list literal gets the descriptive error, not an NPE
    val eNull = intercept[Exception](
      spark.sql("SELECT stopword_count(array('x'), array('a', NULL))").collect())
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(!chain(eNull).exists(_.isInstanceOf[NullPointerException]))
    assert(chain(eNull).exists(t =>
      t.getMessage != null && t.getMessage.contains("string literals")))
    assert(new GraftExtensions() != null) // extension class constructs
  }
}
