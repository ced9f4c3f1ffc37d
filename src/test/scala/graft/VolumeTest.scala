package graft

import org.scalatest.Tag

/** Marks the multi-minute planted-truth volume tests (round-13 verdict #2:
  * the committed suite wall hit 20m16s against a 28 min ceiling, ~6 min of
  * it VolumeTruthSpec). Tagged tests are EXCLUDED from the default
  * `sbt test` and run once per round instead:
  *
  *   GRAFT_VOLUME=1 sbt "testOnly graft.VolumeTruthSpec"
  *
  * (build.sbt drops the `-l graft.VolumeTest` exclusion when GRAFT_VOLUME
  * is set). The per-round close records the run in CLOSING.md via
  * `tools/closing_state.py --volume-log` — coverage per round is unchanged,
  * only its placement moves out of the every-run wall. */
object VolumeTest extends Tag("graft.VolumeTest")
