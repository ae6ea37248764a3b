package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

/** Entity resolution: hand-built dirty registers with known ground truth —
  * multi-key blocking recall, edit-distance gating, transitive closure,
  * block-size cap, golden-record survivorship.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  // suffix-4 and digit-run keys, as the gate query uses
  private val keys: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
    Seq(nm => substring(nm, -4, 4), nm => regexp_replace(nm, "[^0-9]", ""))

  test("variants cluster to the true entity; strangers stay apart") {
    val recs = Seq(
      (1L, "Acme Corp 0042"),
      (2L, "acme  corp 0042"),   // normalization dup (distance 0)
      (3L, "Acme Crp 0042"),     // one deletion
      (4L, "Acme Corp 0042x"),   // one insertion (defeats the suffix key)
      (5L, "Zenith Ltd 7777"),   // unrelated
      (6L, "Zenith Ltd 7717"))   // shares no key with 5 (suffix+digits differ)
      .toDF("id", "name")
    val r = EntityResolution.resolve(recs, "id", "name", keys, maxEdit = 1)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 6L))
  }

  test("multi-key blocking: each key alone misses a variant the union catches") {
    val recs = Seq(
      (1L, "acme corp 0042"),
      (2L, "acme crp 0042"),    // suffix intact, digit-run intact
      (3L, "acme corp 0042x"))  // suffix broken, digit-run intact
      .toDF("id", "name")
    val suffixOnly = EntityResolution.matchPairs(recs, "id", "name",
      Seq(keys.head), maxEdit = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val digitsOnly = EntityResolution.matchPairs(recs, "id", "name",
      Seq(keys(1)), maxEdit = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val both = EntityResolution.matchPairs(recs, "id", "name", keys,
      maxEdit = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(!suffixOnly.contains((1L, 3L)) && digitsOnly.contains((1L, 3L)))
    assert(both == suffixOnly ++ digitsOnly)
    assert(both.contains((1L, 2L)) && both.contains((1L, 3L)))
  }

  test("maxEdit gates: distance-2 variant excluded at maxEdit=1, included at 2") {
    val recs = Seq((1L, "acme corp 0042"), (2L, "acme cp 0042"))
      .toDF("id", "name") // two deletions apart; digit key shared
    def pairsAt(d: Int) =
      EntityResolution.matchPairs(recs, "id", "name", keys, maxEdit = d)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairsAt(1).isEmpty)
    assert(pairsAt(2) == Set((1L, 2L)))
  }

  test("block-size cap drops the degenerate key wholesale") {
    // 50 records share the digit-run key "1" but have distinct suffixes —
    // capping at 10 leaves no shared block, so no pairs at all
    val recs = (0 until 50).map(i => (i.toLong, s"node $i a1")).toDF("id", "name")
    val capped = EntityResolution.matchPairs(recs, "id", "name",
      Seq(nm => regexp_replace(nm, "[^0-9]", "")), maxEdit = 2,
      maxBlockSize = 10)
    assert(capped.count() == 0)
  }

  test("golden records: member count and min-id survivorship") {
    val recs = Seq(
      (7L, "acme corp 0042"), (3L, "Acme Corp 0042"), (9L, "acme crp 0042"),
      (5L, "zenith 7777"))
      .toDF("id", "name")
    val g = EntityResolution.goldenRecords(recs, "id", "name", keys,
      maxEdit = 1)
      .as[(Long, Long, String)].collect().toSet
    assert(g == Set((3L, 3L, "Acme Corp 0042"), (5L, 1L, "zenith 7777")))
  }
}
