package graft.operators

import scala.collection.mutable

/** In-memory HNSW graph (Malkov & Yashunin, TPAMI 2018) over L2-normalized
  * vectors with inner-product "distance" (1 - dot). Used PER IVF CELL by
  * [[Similarity.ivfHnswTopK]]: each executor builds graphs only for the
  * cells in its partition, so graph memory scales with partition size, not
  * corpus size — the distributed answer to "HNSW needs the whole index in
  * RAM".
  *
  * Simple-select neighbor pruning (keep the M closest) — the original
  * paper's baseline heuristic; deterministic for a fixed seed and insert
  * order.
  */
final class Hnsw(dim: Int, m: Int = 16, efConstruction: Int = 100,
    seed: Long = 42L) {
  private val mL = 1.0 / math.log(m.toDouble)
  private val maxM0 = 2 * m
  private val rng = new scala.util.Random(seed)

  private val vecs = mutable.ArrayBuffer.empty[Array[Double]]
  private val ids = mutable.ArrayBuffer.empty[Long]
  private val levels = mutable.ArrayBuffer.empty[Int]
  // neighbors(node)(layer) -> ArrayBuffer of node indices
  private val neighbors = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entry: Int = -1
  private var topLevel: Int = -1

  @inline private def dist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < dim) { s += a(i) * b(i); i += 1 }
    1.0 - s
  }

  def size: Int = vecs.length

  /** Greedy ef-bounded search inside one layer; returns (dist, node) pairs
    * sorted ascending by distance.
    */
  private def searchLayer(q: Array[Double], ep: Int, ef: Int,
      layer: Int): mutable.ArrayBuffer[(Double, Int)] = {
    val visited = mutable.HashSet(ep)
    val epDist = dist(q, vecs(ep))
    // candidates: min-heap by distance; results: max-heap by distance
    implicit val byDist: Ordering[(Double, Int)] = Ordering.by(_._1)
    val candidates = mutable.PriorityQueue((-epDist, ep))(Ordering.by(_._1))
    val results = mutable.PriorityQueue((epDist, ep))
    while (candidates.nonEmpty) {
      val (negD, c) = candidates.dequeue()
      if (-negD > results.head._1 && results.size >= ef) {
        candidates.clear() // closest candidate is worse than worst result
      } else {
        val ns = neighbors(c)(layer)
        var i = 0
        while (i < ns.length) {
          val n = ns(i)
          if (!visited.contains(n)) {
            visited += n
            val d = dist(q, vecs(n))
            if (results.size < ef || d < results.head._1) {
              candidates.enqueue((-d, n))
              results.enqueue((d, n))
              if (results.size > ef) results.dequeue()
            }
          }
          i += 1
        }
      }
    }
    val out = mutable.ArrayBuffer.from(results)
    out.sortInPlace()(Ordering.by(_._1))
    out
  }

  def insert(id: Long, vec: Array[Double]): Unit = {
    val node = vecs.length
    val level = math.floor(-math.log(rng.nextDouble() + 1e-300) * mL).toInt
    vecs += vec
    ids += id
    levels += level
    neighbors += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])

    if (entry < 0) { entry = node; topLevel = level; return }

    var ep = entry
    // descend layers above the node's level greedily (ef = 1)
    var layer = topLevel
    while (layer > level) {
      ep = searchLayer(vec, ep, 1, layer).head._2
      layer -= 1
    }
    // connect on each layer from min(level, topLevel) down to 0
    layer = math.min(level, topLevel)
    while (layer >= 0) {
      val w = searchLayer(vec, ep, efConstruction, layer)
      val cap = if (layer == 0) maxM0 else m
      val selected = w.take(m)
      selected.foreach { case (_, n) =>
        neighbors(node)(layer) += n
        val back = neighbors(n)(layer)
        back += node
        if (back.length > cap) {
          // prune to the cap closest
          val pruned = back.map(x => (dist(vecs(n), vecs(x)), x))
            .sortBy(_._1).take(cap).map(_._2)
          back.clear()
          back ++= pruned
        }
      }
      ep = w.head._2
      layer -= 1
    }
    if (level > topLevel) { topLevel = level; entry = node }
  }

  /** Serialized node view: (id, vector, level, per-layer neighbor IDS,
    * isEntry). Adjacency is stored by external id, not node index, so a
    * restored graph is insert-order independent.
    */
  def dump(): Iterator[Hnsw.Node] = {
    (0 until vecs.length).iterator.map { n =>
      Hnsw.Node(ids(n), vecs(n), levels(n),
        neighbors(n).map(_.map(ids(_)).toArray),
        isEntry = n == entry)
    }
  }

  private def restoreFrom(nodes: Seq[Hnsw.Node]): Unit = {
    val indexOf = mutable.HashMap.empty[Long, Int]
    nodes.zipWithIndex.foreach { case (nd, i) => indexOf(nd.id) = i }
    nodes.foreach { nd =>
      vecs += nd.vec
      ids += nd.id
      levels += nd.level
      neighbors += nd.neighbors.map(layer =>
        mutable.ArrayBuffer.from(layer.map(indexOf)))
      if (nd.isEntry) { entry = vecs.length - 1; topLevel = nd.level }
    }
  }

  /** Top-k ids by cosine (descending dot) with search beam `ef`. */
  def search(q: Array[Double], k: Int, ef: Int): Seq[(Long, Double)] = {
    if (entry < 0) return Nil
    var ep = entry
    var layer = topLevel
    while (layer > 0) {
      ep = searchLayer(q, ep, 1, layer).head._2
      layer -= 1
    }
    searchLayer(q, ep, math.max(ef, k), 0)
      .take(k)
      .map { case (d, n) => (ids(n), 1.0 - d) }
      .toSeq
  }
}

object Hnsw {
  /** One serialized graph node. */
  final case class Node(id: Long, vec: Array[Double], level: Int,
      neighbors: Array[Array[Long]], isEntry: Boolean)

  /** Rebuild a graph from [[Hnsw#dump]] output — adjacency is restored
    * verbatim (no re-insertion), so a restored graph answers every search
    * identically to the original.
    */
  def restore(dim: Int, nodes: Seq[Node], m: Int = 16,
      efConstruction: Int = 100, seed: Long = 42L): Hnsw = {
    val g = new Hnsw(dim, m, efConstruction, seed)
    g.restoreFrom(nodes)
    g
  }
}
