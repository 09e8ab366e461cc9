package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import ManifestStats._

/** Encoding/collation soundness of the file-skipping stats: pruning must
  * NEVER drop a file that could contain matching rows, for every value the
  * encoder accepts — including supplementary-plane strings and pre-epoch
  * timestamps, where naive Java orderings disagree with Spark's. */
class ManifestStatsSpec extends AnyFunSuite {

  private def entry(col: String, tag: Char, mn: String, mx: String) =
    FileEntry("a/f.parquet", Map(col -> ColStats(tag, mn, mx)))

  test("string stats compare in UTF-8 byte order (Spark's UTF8String), not UTF-16 code units") {
    // U+10000 (surrogate pair D800 DC00) vs U+FFFD: UTF-16 code-unit order
    // says U+10000 < U+FFFD (D800 < FFFD), but Spark's min/max aggregate
    // compares UTF8String bytes = code-point order, where U+10000 > U+FFFD.
    val supp = new String(Character.toChars(0x10000)) // "𐀀"
    val bmp = "�"
    // file holds only the supplementary string; predicate c >= U+FFFD must
    // KEEP it (max = U+10000 >= U+FFFD in true order); String.compareTo
    // would wrongly prune
    assert(mightMatch(entry("c", 's', supp, supp), Seq(StatGte("c", bmp))))
    // symmetric: file min = U+FFFD, predicate c <= U+10000 must keep
    assert(mightMatch(entry("c", 's', bmp, bmp), Seq(StatLte("c", supp))))
    // and a genuinely out-of-range file still prunes
    assert(!mightMatch(entry("c", 's', "a", "b"), Seq(StatGte("c", "c"))))
  }

  test("pre-epoch timestamps encode with floor semantics (ordering-preserving micros)") {
    val before = java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5")
    val after = java.sql.Timestamp.valueOf("1970-01-01 00:00:00.5")
    val Some((tagB, encB)) = encodeValue(before)
    val Some((tagA, encA)) = encodeValue(after)
    assert(tagB == 'l' && tagA == 'l')
    assert(encB.toLong == -500000L, s"1969-12-31T23:59:59.5 must encode as -500000µs, got $encB")
    assert(encA.toLong == 500000L)
    assert(encB.toLong < encA.toLong, "pre-epoch must order below post-epoch")
    // agreement with the Instant branch (the floor-based reference encoding)
    assert(encodeValue(before.toInstant).map(_._2) == Some(encB))
    // and pruning keyed on a pre-epoch range is sound: a file spanning
    // [1969-12-31T23:59:59.5, 1970-01-01T00:00:00.5] must match an
    // equality probe at either end
    val e = entry("ts", 'l', encB, encA)
    assert(mightMatch(e, Seq(StatEq("ts", before))))
    assert(mightMatch(e, Seq(StatEq("ts", after))))
    assert(!mightMatch(e, Seq(StatLte("ts", java.sql.Timestamp.valueOf("1969-12-31 23:59:58.0")))))
  }

  test("render/parse round-trips entries with tabs, unicode and stats-free lines") {
    val e = FileEntry("_a1_ab/part-00000.parquet",
      Map("name\twith\ttabs" -> ColStats('s', "min\n𐀀", "max\t✓"),
        "n" -> ColStats('l', "-5", "7")))
    assert(parseLine(e.render) == e)
    val bare = FileEntry("_a2_cd/part-00001.parquet", Map.empty)
    assert(parseLine(bare.render) == bare)
  }
}
