package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level scale-hygiene gate for the public query wrappers.
  *
  * `SparkEntry.queries` is the engine's example surface: a reader copies
  * its patterns. A `collect()` whose cardinality is corpus- or
  * pair-stream-proportional is the one pattern that silently works at
  * sf0.1 and OOMs the driver at 100 TB (round-13 verdict: x42/x115/x117
  * all did exactly this). The sanctioned alternatives are a distributed
  * aggregation (x117's threshold sweep) or [[QueriesExt.checkpointed]]
  * (x42's fold freeze, x115's pair-stream freeze).
  *
  * The gate: every `.collect()` in the wrapper files must carry a
  * same-line `// bounded:` justification naming the bound (rows per
  * source / version / bucket / change type — cardinalities fixed by the
  * query's own grouping keys, independent of corpus size). An unmarked
  * collect fails the build; a marked-but-unbounded one is the reviewer's
  * to catch, and the marker is the flag that review is owed.
  */
class CollectHygieneSpec extends AnyFunSuite {

  private val wrapperFiles = Seq(
    "src/main/scala/graft/QueriesCore.scala",
    "src/main/scala/graft/QueriesExt.scala",
    "src/main/scala/graft/QueriesSketch.scala",
    "src/main/scala/graft/SparkEntry.scala")

  test("every collect() in a query wrapper declares its bound") {
    val offenders = wrapperFiles.flatMap { path =>
      val src = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      (0 until src.size).collect {
        case i if src.get(i).contains(".collect()") &&
            !src.get(i).contains("// bounded:") =>
          s"$path:${i + 1}: ${src.get(i).trim}"
      }
    }
    assert(offenders.isEmpty,
      "collect() without a same-line '// bounded: <why>' marker — use a " +
        "distributed aggregation or QueriesExt.checkpointed instead:\n" +
        offenders.mkString("\n"))
  }

  test("wrapper files do not use localCheckpoint (pins executor storage)") {
    // localCheckpoint persists into the block manager until GC, violating
    // the smoke suite's leave-no-cached-RDDs rule; reliable checkpoint
    // (QueriesExt.checkpointed) is the freeze primitive wrappers use.
    val offenders = wrapperFiles.flatMap { path =>
      val src = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      (0 until src.size).collect {
        case i if src.get(i).contains("localCheckpoint(") =>
          s"$path:${i + 1}: ${src.get(i).trim}"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
