package graft

import org.scalatest.funsuite.AnyFunSuite

/** Knob-honesty contract of the streaming bench (ADVICE r16, VERDICT
  * r17 harness list): an artifact must never claim an unapplied knob
  * nor hide an applied one. Pinned through the env-injectable twins
  * so no JVM fork is needed.
  */
class StreamBenchKnobsSpec extends AnyFunSuite {

  test("unknown provider values fail fast instead of measuring the default") {
    val e = intercept[IllegalArgumentException] {
      StreamBench.validateKnobs(Map("SPARK_GRAFT_STREAM_PROVIDER" -> "RocksDB"))
    }
    assert(e.getMessage.contains("RocksDB") &&
      e.getMessage.contains("rocksdb"))
    StreamBench.validateKnobs(Map("SPARK_GRAFT_STREAM_PROVIDER" -> "rocksdb"))
    StreamBench.validateKnobs(Map.empty)
  }

  test("every measurement-altering knob is recorded, instrumentation included") {
    // STAGES runs a listener DURING the measured batches — an
    // instrumented reading is a knobbed one (ADVICE r16); the key
    // must be in the recorded set so an artifact can't hide it
    assert(StreamBench.KnobKeys.contains("SPARK_GRAFT_STREAM_STAGES"))
    val env = Map(
      "SPARK_GRAFT_STREAM_STAGES" -> "1",
      "SPARK_GRAFT_STREAM_PARTS" -> "8",
      "UNRELATED_ENV" -> "x")
    val knobs = StreamBench.activeKnobs(env).toMap
    assert(knobs == Map(
      "SPARK_GRAFT_STREAM_STAGES" -> "1",
      "SPARK_GRAFT_STREAM_PARTS" -> "8"))
    assert(StreamBench.activeKnobs(Map("UNRELATED_ENV" -> "x")).isEmpty)
  }
}
