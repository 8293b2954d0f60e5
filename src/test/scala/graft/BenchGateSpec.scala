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

  test("unlucky-median exoneration: the round-14 driver shapes " +
      "(median fires, min at/below prior) stay quiet; a planted " +
      "regression whose min also fires still pages") {
    // the two round-14 false positives, verbatim from the driver's
    // quiet-host bench_metric.json (host_factor 0.805): medians blew
    // past 1.5× the normalized prior because two of three passes ran
    // contended, but each query's MIN pass sat at/below its committed
    // prior — the code path did not regress.
    val prevR14 = prev +
      ("basket_part_pairs" -> 2.078) + ("bigram_lm_holdout" -> 1.280)
    val now = prevR14.toSeq.map {
      case (n, _) if n == "basket_part_pairs" => n -> 5.474
      case (n, _) if n == "bigram_lm_holdout" => n -> 3.408
      case (n, p) => n -> p * 0.805 // quiet host: everything else cool
    }
    val mins = Map("basket_part_pairs" -> 1.507,
      "bigram_lm_holdout" -> 0.824) ++
      prev.keys.map(n => n -> prevR14(n) * 0.78)
    val (hf, regs) = Bench.regressionGate(now, prevR14, mins)
    assert(hf >= 0.79 && hf <= 0.82, s"host factor $hf")
    assert(regs.isEmpty,
      s"min-exonerated unlucky medians still paged: $regs")
    // a REAL regression slows every pass: min fires with the median
    val nowReal = now.map {
      case (n, _) if n == "q30" => n -> prevR14("q30") * 2.6
      case x => x
    }
    val (_, regsReal) = Bench.regressionGate(nowReal, prevR14,
      mins + ("q30" -> prevR14("q30") * 2.4))
    assert(regsReal.map(_._1) === Seq("q30"),
      s"expected exactly the planted q30: $regsReal")
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
