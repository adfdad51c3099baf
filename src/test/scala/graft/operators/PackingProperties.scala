package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based laws for the lazy next-fit bin packer — pure iterator
  * level, no Spark jobs, so hundreds of cases are cheap. The x48 oracle
  * checks the same laws once over the real corpus; this sweeps the edge
  * space (empty input, all-oversize, capacity-exact fits, mixed runs).
  */
object PackingProperties extends Properties("graft.packing") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val genChunks: Gen[List[Long]] =
    Gen.listOf(Gen.oneOf(Gen.choose(1L, 50L), Gen.choose(60L, 90L)))

  private def pack(tokens: List[Long], capacity: Long)
      : List[(Long, Long, Long)] = {
    import org.apache.spark.sql.Row
    TextPipeline.packIterator(
      tokens.zipWithIndex.map { case (n, i) => Row(i.toLong, n) }.iterator,
      nIdx = 1, capacity = capacity, pid = 3L)
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toList // (chunk id, bin id, bin fill)
  }

  property("conservation, capacity, fill consistency, oversize isolation," +
      " next-fit order") = forAll(genChunks) { tokens =>
    val capacity = 64L
    val out = pack(tokens, capacity)
    val byBin = out.groupBy(_._2)
    val conserved = out.map(_._1).sorted == tokens.indices.map(_.toLong)
    val fillsConsistent = byBin.values.forall { rows =>
      val ids = rows.map(_._1)
      rows.map(_._3).distinct.size == 1 &&
        rows.head._3 == ids.map(i => tokens(i.toInt)).sum
    }
    val capacityHolds = byBin.values.forall { rows =>
      rows.head._3 <= capacity || rows.size == 1
    }
    val oversizeIsolated = out.filter(r => tokens(r._1.toInt) > capacity)
      .forall(r => byBin(r._2).size == 1)
    // next-fit: chunks appear in input order and bin ids never decrease
    val ordered = out.map(_._1) == tokens.indices.map(_.toLong) &&
      out.map(_._2) == out.map(_._2).sorted
    conserved && fillsConsistent && capacityHolds && oversizeIsolated &&
      ordered
  }

  property("empty input packs to nothing") =
    pack(Nil, 64L).isEmpty
}
