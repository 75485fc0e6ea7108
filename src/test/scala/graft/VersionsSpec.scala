package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.versions.Versions

class VersionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def versions = Seq(
    // nk "u1": three versions; ntp...03 latest by updated
    ("ntp00000001", "u1", "2024-01-01 00:00:00"),
    ("ntp00000002", "u1", "2024-01-02 00:00:00"),
    ("ntp00000003", "u1", "2024-01-03 00:00:00"),
    // nk "u2": tie on updated -> max _id wins
    ("ntp00000004", "u2", "2024-02-01 00:00:00"),
    ("ntp00000005", "u2", "2024-02-01 00:00:00"),
    // nk "u3": single version
    ("ntp00000006", "u3", "2024-03-01 00:00:00")
  ).toDF("_id", "id", "updated")

  test("resolveLatest picks max updated, tie-break max _id (W2)") {
    val latest = Versions.resolveLatest(versions, "id", "_id", "updated")
      .orderBy("id").collect().map(r => r.getAs[String]("id") -> r.getAs[String]("_id"))
    assert(latest.toSeq == Seq(
      "u1" -> "ntp00000003", "u2" -> "ntp00000005", "u3" -> "ntp00000006"))
  }

  test("tombstones point every loser at the active id (J3 setup)") {
    val ts = Versions.tombstones(versions, "id", "_id", "updated")
      .orderBy("_id").collect()
    assert(ts.map(_.getAs[String]("_id")).toSeq ==
      Seq("ntp00000001", "ntp00000002", "ntp00000004"))
    assert(ts.forall(_.getAs[Boolean]("obsolete_version")))
    assert(ts.map(_.getAs[String]("updated_to")).toSeq ==
      Seq("ntp00000003", "ntp00000003", "ntp00000005"))
  }

  test("resolveLatest is deterministic under input permutation") {
    val shuffled = versions.orderBy(rand(seed = 7))
    val a = Versions.resolveLatest(versions, "id", "_id", "updated")
      .orderBy("id").collect().toSeq
    val b = Versions.resolveLatest(shuffled, "id", "_id", "updated")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("resolveChains follows pointer chains to the head (J3)") {
    // chain: 1 -> 2 -> 3 -> 9 (head), plus 5 -> 9 direct
    val edges = Seq(
      ("ntp00000001", "ntp00000002"),
      ("ntp00000002", "ntp00000003"),
      ("ntp00000003", "ntp00000009"),
      ("ntp00000005", "ntp00000009")
    ).toDF("src", "dst")
    val resolved = Versions.resolveChains(edges, "src", "dst")
      .orderBy("src").collect()
      .map(r => r.getAs[String]("src") -> r.getAs[String]("resolved_to"))
    assert(resolved.toSeq == Seq(
      "ntp00000001" -> "ntp00000009",
      "ntp00000002" -> "ntp00000009",
      "ntp00000003" -> "ntp00000009",
      "ntp00000005" -> "ntp00000009"))
    // distributed tier must agree with the driver tier (incl. null heads)
    val withNull = edges.unionByName(
      Seq(("ntp00000009", Option.empty[String])).toDF("src", "dst"))
    val viaDriver = Versions.resolveChains(withNull, "src", "dst")
      .collect().map(r => r.getAs[String]("src") -> Option(r.getAs[String]("resolved_to"))).toMap
    val viaJoin = Versions.resolveChains(withNull, "src", "dst", driverMaxEdges = 0)
      .collect().map(r => r.getAs[String]("src") -> Option(r.getAs[String]("resolved_to"))).toMap
    assert(viaDriver == viaJoin)
    assert(viaDriver("ntp00000009").isEmpty)
  }

  test("resolveChains byte gate: wide rows under the row cap still go distributed") {
    // few rows (far under driverMaxEdges) but each ~64 KB wide: the BYTE
    // gate must route them to the distributed tier, and the tiers agree
    val pad = "x" * 65536
    val edges = (1 to 50).map(i => (f"$pad-$i%04d", f"$pad-${i + 1}%04d")).toDF("src", "dst")
    val viaDistributed = Versions.resolveChains(edges, "src", "dst", driverMaxBytes = 1024)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaDriver = Versions.resolveChains(edges, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaDistributed == viaDriver)
    assert(viaDistributed(f"$pad-0001") == f"$pad-0051") // whole chain resolved
  }

  test("diffFields: added / modified / missing with '' as absence (F18)") {
    val df = Seq((("a", "", "x"), ("a2", "b", ""))).toDF("n", "o")
      .select(Versions.diffFields(
        struct(col("n._1").as("f1"), col("n._2").as("f2"), col("n._3").as("f3")),
        struct(col("o._1").as("f1"), col("o._2").as("f2"), col("o._3").as("f3")),
        Seq("f1", "f2", "f3")).as("d"))
    val r = df.select("d.added", "d.modified", "d.missing").collect().head
    assert(r.getAs[scala.collection.Seq[String]]("added") == Seq("f3"))
    assert(r.getAs[scala.collection.Seq[String]]("modified") == Seq("f1"))
    assert(r.getAs[scala.collection.Seq[String]]("missing") == Seq("f2"))
  }

  test("mergeRecords: non-empty new wins, empty never overwrites (F19)") {
    val df = Seq((Map("a" -> "new", "b" -> ""), Map("a" -> "old", "b" -> "keep")))
      .toDF("n", "o")
      .select(Versions.mergeRecords(col("n"), col("o")).as("m"))
    val m = df.collect().head.getAs[Map[String, String]]("m")
    assert(m == Map("a" -> "new", "b" -> "keep"))
  }
}
