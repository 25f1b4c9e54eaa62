package graft

import org.scalatest.funsuite.AnyFunSuite

/** The in-band bench-window adjudication (Bench.adjudicate/floorsJson):
  * every BENCH json line must carry its own environment verdict —
  * control drift, floor ratios, over-2× lanes — so a degraded window
  * (r15/r16 both had one) needs no manual archaeology. Pure logic, no
  * Spark session.
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  private val floors: Map[String, Double] = Map(
    "q_a" -> 0.5, "q_b" -> 1.0, "q_c" -> 2.0,
    "q_pack_sequences" -> 0.8, "q_bpe_train" -> 0.7, "q_image_resize" -> 1.2,
    "q_audio_mfcc" -> 0.5, "q_dsir_weights" -> 1.0)

  private def at(ratio: Double, names: Iterable[String]): Seq[(String, Double)] =
    names.toSeq.map(n => n -> floors(n) * ratio)

  test("clean window: lanes at their floors adjudicate clean, drift 1.0") {
    val adj = Bench.adjudicate(at(1.0, floors.keys), floors).get
    assert(adj.window == "clean")
    assert(math.abs(adj.controlDrift - 1.0) < 1e-9)
    assert(math.abs(adj.medianRatio - 1.0) < 1e-9)
    assert(adj.over2x.isEmpty)
    assert(adj.nFloored == floors.size)
  }

  test("environment elevation: controls rise in lockstep with the lanes -> " +
      "elevated, then degraded past 1.6x") {
    val adj = Bench.adjudicate(at(1.4, floors.keys), floors).get
    assert(adj.window == "elevated", adj.toString)
    assert(math.abs(adj.controlDrift - 1.4) < 1e-9)
    val bad = Bench.adjudicate(at(1.8, floors.keys), floors).get
    assert(bad.window == "degraded")
  }

  test("a real per-lane regression shows as over-2x against CLEAN controls " +
      "(the separation hand-adjudication needed)") {
    val results = at(1.05, floors.keys).map {
      case ("q_b", _) => "q_b" -> floors("q_b") * 2.5 // the suspect
      case other => other
    }
    val adj = Bench.adjudicate(results, floors).get
    assert(adj.window == "clean") // controls near floor: not the environment
    assert(adj.over2x == Seq("q_b"))
  }

  test("failed lanes (-1) and unfloored lanes are excluded from ratios") {
    val results = Seq("q_a" -> -1.0, "q_new_lane" -> 5.0) ++
      at(1.0, Seq("q_b", "q_pack_sequences"))
    val adj = Bench.adjudicate(results, floors).get
    assert(adj.nFloored == 2)
    assert(adj.over2x.isEmpty)
  }

  test("no floor baseline -> None -> json says no-floor-baseline; with " +
      "floors the json parses and carries the verdict keys") {
    assert(Bench.adjudicate(at(1.0, floors.keys), Map.empty).isEmpty)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val none = om.readTree(Bench.floorsJson(None, "BENCH_floor.json"))
    assert(none.get("window").asText() == "no-floor-baseline")
    val adj = Bench.adjudicate(at(1.3, floors.keys), floors)
    val node = om.readTree(Bench.floorsJson(adj, "BENCH_floor.json"))
    assert(node.get("window").asText() == "elevated")
    assert(math.abs(node.get("control_drift").asDouble() - 1.3) < 0.01)
    assert(math.abs(node.get("median_floor_ratio").asDouble() - 1.3) < 0.01)
    assert(node.get("lanes_over_2x_floor").isArray &&
      node.get("lanes_over_2x_floor").size() == 0)
    assert(node.get("controls").isObject &&
      node.get("controls").size() == Bench.controlLanes.size)
    assert(node.get("n_floored").asInt() == floors.size)
  }

  test("a control whose floor was re-established is excluded from the " +
      "drift verdict and the exclusion is emitted in-band") {
    // three controls' floors were reset in the measured window itself
    // (their ratios read 1.0 BY CONSTRUCTION) while the surviving
    // controls sit at 1.5x: including them makes an elevated window read
    // clean — the silent-rot scenario the provenance exists to stop
    val reset = Set("q_pack_sequences", "q_bpe_train", "q_image_resize")
    val results = at(1.5, floors.keys).map {
      case (n, _) if reset.contains(n) => n -> floors(n)
      case other => other
    }
    val honest = Bench.adjudicate(results, floors, reestablished = reset).get
    assert(honest.controlsExcluded.toSet == reset)
    assert(math.abs(honest.controlDrift - 1.5) < 1e-9,
      s"excluded controls still moved the drift: ${honest.controlDrift}")
    assert(honest.window == "elevated")
    assert(honest.controlRatios.forall(t => !reset.contains(t._1)))
    // without the provenance the same window adjudicates itself CLEAN
    val rotted = Bench.adjudicate(results, floors).get
    assert(rotted.controlDrift < honest.controlDrift)
    assert(rotted.window == "clean", rotted.toString)
    // the exclusion rides the json; absent when nothing was excluded
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(Bench.floorsJson(Some(honest), "BENCH_floor.json"))
    assert(node.get("controls_reestablished").isArray &&
      node.get("controls_reestablished").size() == 3)
    assert(node.get("controls").size() == Bench.controlLanes.size - 3)
    val plain = om.readTree(Bench.floorsJson(Some(rotted), "BENCH_floor.json"))
    assert(plain.get("controls_reestablished") == null)
    // ALL controls re-established -> no-controls, never a fake verdict
    val none = Bench.adjudicate(results, floors,
      reestablished = Bench.controlLanes.toSet).get
    assert(none.window == "no-controls")
  }

  test("a window with no control lanes present reports no-controls and " +
      "omits control_drift (NaN would corrupt the json)") {
    val adj = Bench.adjudicate(at(1.0, Seq("q_a", "q_b", "q_c")), floors)
    assert(adj.get.window == "no-controls")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(Bench.floorsJson(adj, "BENCH_floor.json"))
    assert(node.get("window").asText() == "no-controls")
    assert(node.get("control_drift") == null)
  }
}
