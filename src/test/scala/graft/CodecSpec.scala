package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.index.Codec

/** Property tests for the posting codec (FIXTURES.md §4):
  * decode(encode(xs)) == xs for any sorted strictly-increasing docIDs and
  * positive tfs. ScalaCheck props driven with a fixed seed via Prop checks
  * inside FunSuite (scalatestplus bridge not available offline). */
class CodecSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val docIdsGen: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 1L << 40)).map(_.distinct.sorted.toArray)

  test("varlong round-trip") {
    check("varlong", Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { v =>
      val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
      Codec.writeVarLong(buf, v)
      val (got, pos) = Codec.readVarLong(buf.toArray, 0)
      got == v && pos == buf.length
    })
  }

  test("docID delta-gap round-trip") {
    check("docids", Prop.forAll(docIdsGen) { ids =>
      Codec.decodeDocIds(Codec.encodeDocIds(ids), ids.length).toSeq == ids.toSeq
    })
  }

  test("tf round-trip") {
    check("tfs", Prop.forAll(Gen.listOf(Gen.chooseNum(1, 1 << 20))) { tfsList =>
      val tfs = tfsList.toArray
      Codec.decodeTfs(Codec.encodeTfs(tfs), tfs.length).toSeq == tfs.toSeq
    })
  }

  test("gap encoding is compact: dense ids cost ~1 byte each") {
    val ids = Array.tabulate(10000)(i => i.toLong * 2)
    assert(Codec.encodeDocIds(ids).length <= 10000 + 4)
  }

  test("PFor round-trip: arbitrary non-negative longs, skewed exception mixes") {
    val smallBig: Gen[List[Long]] = Gen.listOf(Gen.frequency(
      9 -> Gen.chooseNum(0L, 15L), // low-width bulk
      1 -> Gen.chooseNum(0L, Long.MaxValue))) // patched exceptions
    check("pfor", Prop.forAll(smallBig) { vs =>
      val a = vs.toArray
      Codec.decodePfor(Codec.encodePfor(a), a.length).toSeq == a.toSeq
    })
    // all-exceptions and all-zero edges
    val zeros = Array.fill(128)(0L)
    assert(Codec.decodePfor(Codec.encodePfor(zeros), 128).toSeq == zeros.toSeq)
    val huge = Array.fill(300)(Long.MaxValue) // >255 exceptions path
    assert(Codec.decodePfor(Codec.encodePfor(huge), 300).toSeq == huge.toSeq)
  }

  test("PFor beats the dense-gap bound varbyte could not: 1-bit gaps pack 8×") {
    val ids = Array.tabulate(10000)(i => i.toLong * 2) // every gap = 1
    // 10000 × 1-bit packed ≈ 1250 bytes (varbyte floor was 1 byte/value)
    assert(Codec.encodeDocIds(ids).length <= 1300)
  }

  test("strictly-increasing precondition enforced") {
    intercept[IllegalArgumentException] {
      Codec.encodeDocIds(Array(3L, 3L))
    }
  }

  test("positions round-trip: per-doc strictly-increasing arrays, tfs as lengths") {
    val perDocGen: Gen[Array[Array[Int]]] =
      Gen.listOf(
        Gen.nonEmptyListOf(Gen.chooseNum(0, 1 << 20))
          .map(_.distinct.sorted.toArray).suchThat(_.nonEmpty))
        .map(_.toArray)
    val p = Prop.forAll(perDocGen) { perDoc =>
      val tfs = perDoc.map(_.length)
      val enc = Codec.encodePositions(perDoc)
      val dec = Codec.decodePositions(enc, tfs)
      if (perDoc.isEmpty) dec == null // zero positions → positionless block
      else dec.length == perDoc.length &&
        dec.zip(perDoc).forall { case (a, b) => a.sameElements(b) }
    }
    check("positions-roundtrip", p)
    // positionless block: empty bytes, decode reports null
    assert(Codec.encodePositions(Array.empty).isEmpty)
    assert(Codec.decodePositions(Array.emptyByteArray, Array(2, 1)) == null)
  }
}
