package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Structural config validation (reference: validation.py + jsonschema
  * analysis_config.yaml): unknown keys, wrong types, missing required
  * fields — all collected at once with rooted paths.
  */
class ValidationSpec extends AnyFunSuite {

  private def yaml(s: String): Map[String, Any] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-val")
    val p = dir.resolve("c.yaml")
    java.nio.file.Files.writeString(p, s)
    ConfigIO.loadMap(p.toString)
  }

  private val valid =
    """simulation_campaign: /c.yaml
      |output: /out
      |seed: 7
      |analysis:
      |  spikes:
      |    extraction:
      |      report: {type: spikes}
      |      neuron_classes:
      |        all: {}
      |        lim: {query: {layer: 2}, limit: 10}
      |      windows:
      |        w1: {bounds: [0, 100], n_trials: 2, trial_steps_value: 50}
      |        ref: other.extraction.windows.w
      |      trial_steps:
      |        t1: {function: mean_first_spike, bounds: [0, 10], my_param: 3}
      |    features:
      |      - groupby: [simulation_id, window]
      |        function: mean_firing_rates
      |        params: {a: 1}
      |""".stripMargin

  test("a valid config has no violations") {
    assert(Validation.validateAnalysis(yaml(valid)) === Nil)
  }

  test("missing required keys and empty config fail") {
    assert(Validation.validateAnalysis(Map.empty).head.message === "empty configuration")
    val vs = Validation.validateAnalysis(yaml("output: /out"))
    assert(vs.exists(_.message.contains("missing required key 'simulation_campaign'")))
    assert(vs.exists(_.message.contains("missing required key 'analysis'")))
  }

  test("unknown keys are reported with their full path") {
    val vs = Validation.validateAnalysis(yaml(
      """simulation_campaign: /c
        |outptu: /typo
        |analysis:
        |  a:
        |    extraction:
        |      report: {type: spikes}
        |      neuron_classes: {all: {quarry: {x: 1}}}
        |      windows:
        |        w: {bounds: [0, 1], trail_steps_value: 5}
        |""".stripMargin))
    assert(vs.map(_.path).contains("root.outptu"))
    assert(vs.map(_.path).contains("root.analysis.a.extraction.neuron_classes.all.quarry"))
    assert(vs.map(_.path).contains("root.analysis.a.extraction.windows.w.trail_steps_value"))
    assert(vs.forall(_.message == "unknown key"))
  }

  test("wrong types, bad enum values, and bad bounds are reported together") {
    val vs = Validation.validateAnalysis(yaml(
      """simulation_campaign: /c
        |analysis:
        |  a:
        |    extraction:
        |      report: {type: sounds}
        |      neuron_classes: {all: {limit: many}}
        |      windows:
        |        w: {bounds: [0, 1, 2], n_trials: 1.5}
        |    features:
        |      - groupby: okay
        |        function: f
        |""".stripMargin))
    def msg(path: String) = vs.filter(_.path == path).map(_.message).mkString("; ")
    assert(msg("root.analysis.a.extraction.report.type").contains("not one of"))
    assert(msg("root.analysis.a.extraction.neuron_classes.all.limit").contains("expected integer"))
    assert(msg("root.analysis.a.extraction.windows.w.bounds").contains("exactly 2"))
    assert(msg("root.analysis.a.extraction.windows.w.n_trials").contains("expected integer"))
    assert(msg("root.analysis.a.features[0].groupby").contains("expected array"))
    assert(vs.length >= 5) // all collected, not first-error-only
  }

  test("trial_steps: extras allowed as params, initial_offset forbidden") {
    val vs = Validation.validateAnalysis(yaml(
      """simulation_campaign: /c
        |analysis:
        |  a:
        |    extraction:
        |      report: {type: spikes}
        |      neuron_classes: {all: {}}
        |      windows: {w: {bounds: [0, 1]}}
        |      trial_steps:
        |        t: {function: f, bounds: [0, 1], custom_knob: 1, initial_offset: 2}
        |""".stripMargin))
    assert(vs.map(_.path) === Seq("root.analysis.a.extraction.trial_steps.t.initial_offset"))
    assert(vs.head.message === "forbidden key")
  }

  test("loadAnalysis fails fast on malformed configs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-val2")
    val p = dir.resolve("bad.yaml")
    java.nio.file.Files.writeString(p,
      """simulation_campaign: /c
        |analysis:
        |  a: {extraction: {report: {type: spikes}, neuron_classes: {}, windows: {}, bogus: 1}}
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](ConfigIO.loadAnalysis(p.toString))
    assert(e.getMessage.contains("root.analysis.a.extraction.bogus: unknown key"))
  }
}
