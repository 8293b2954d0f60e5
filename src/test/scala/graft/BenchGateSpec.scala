package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench regression gate's two failure modes, replayed
  * synthetically (round-13 verdict What's-wrong #2 acceptance): a
  * globally slow session must NOT flood the list, and a single
  * planted regression must still fire through it. Pure-function spec
  * — no Spark session. */
class BenchGateSpec extends AnyFunSuite {

  private val prev: Map[String, Double] =
    (1 to 40).map(i => s"q$i" -> (0.5 + i * 0.1)).toMap

  test("globally slow replay (all times ×1.3) yields an empty list " +
      "and reports the host factor") {
    val now = prev.toSeq.map { case (n, p) => n -> p * 1.3 }
    val (hf, regs) = Bench.regressionGate(now, prev)
    assert(math.abs(hf - 1.3) < 1e-9, s"host factor $hf != 1.3")
    assert(regs.isEmpty,
      s"host-wide slowdown misread as regressions: $regs")
  }

  test("a planted 2× query fires through a hot session; the rest stay " +
      "quiet") {
    val now = prev.toSeq.map {
      case (n, p) if n == "q30" => n -> p * 2.6 // planted real regression
      case (n, p) => n -> p * 1.2 // host-wide heat
    }
    val (hf, regs) = Bench.regressionGate(now, prev)
    assert(hf >= 1.19 && hf <= 1.21, s"host factor $hf")
    assert(regs.map(_._1) === Seq("q30"),
      s"expected exactly the planted q30: $regs")
  }

  test("micro-query jitter below the absolute floor never pages") {
    val prevMicro = Map("tiny" -> 0.05)
    val (_, regs) = Bench.regressionGate(Seq("tiny" -> 0.2), prevMicro)
    assert(regs.isEmpty, "sub-0.5s drift must not fire")
  }

  test("failed queries (-1) and queries without a prior are skipped") {
    val (hf, regs) = Bench.regressionGate(
      Seq("q1" -> -1.0, "brand_new" -> 9.9, "q2" -> prev("q2")),
      prev)
    assert(hf === 1.0 && regs.isEmpty)
  }

  test("prev-line reader warns-and-disables on format drift, parses a " +
      "real line, and stays silent on a missing file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-benchgate")
    val ok = dir.resolve("ok.json")
    java.nio.file.Files.writeString(ok,
      """{"metric":"total","value":1.5,"queries":{"a":0.5,"b":1},""" +
        """"failed":[]}""" + "\n")
    assert(Bench.readPrevQueries(ok.toString) ===
      Map("a" -> 0.5, "b" -> 1.0))
    val drifted = dir.resolve("drift.json")
    java.nio.file.Files.writeString(drifted,
      """{"metric":"total","per_query":{"a":0.5}}""" + "\n")
    assert(Bench.readPrevQueries(drifted.toString).isEmpty)
    assert(Bench.readPrevQueries(
      dir.resolve("absent.json").toString).isEmpty)
  }
}
