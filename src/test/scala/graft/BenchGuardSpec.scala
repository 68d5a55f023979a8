package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention guard — pinned after the r14 record was
  * polluted by a run that STARTED at 1-minute load 9.65 on a 32-cpu
  * box yet recorded `contended: false` (the old rule tripped only at
  * `load > cpus`): the threshold is a small fraction of the cpus the
  * bench will use, and the bounded calm-down wait delays a loaded
  * start into a clean measurement instead of recording a polluted
  * one.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("contendedAt flags the r14 regime (load 9.65 / 32 cpus) and passes a calm box") {
    // the exact record that slipped through pre-round-15
    assert(Bench.contendedAt(9.65, 32))
    // the builder's clean close run on the same HEAD
    assert(!Bench.contendedAt(0.08, 32))
    // threshold = 0.15 x cpus: just-above trips, just-below doesn't
    assert(Bench.contendedAt(4.81, 32))
    assert(!Bench.contendedAt(4.79, 32))
    // background hum of a merely-alive machine stays unflagged
    assert(!Bench.contendedAt(1.0, 32))
    // a failed load sample (-1) never flags
    assert(!Bench.contendedAt(-1.0, 32))
    // scales with the cpu count, not an absolute number
    assert(Bench.contendedAt(1.0, 4))
  }

  test("waitForCalm polls until the load drops under threshold, logging each wait") {
    val samples = Iterator(9.5, 7.0, 3.1) // descending, calm on 3rd
    val logged = scala.collection.mutable.ArrayBuffer.empty[String]
    var slept = 0L
    val got = Bench.waitForCalm(() => samples.next(), cpus = 32,
      maxWaitMs = 60000L, pollMs = 10L, sleepFn = slept += _,
      log = logged += _)
    assert(got == 3.1)
    assert(slept == 20L, "two waits before the calm sample")
    assert(logged.size == 2 && logged.forall(_.contains("waiting")))
  }

  test("waitForCalm is bounded: a permanently loaded box returns (still contended) after the deadline") {
    var slept = 0L
    val got = Bench.waitForCalm(() => 20.0, cpus = 32,
      maxWaitMs = 1L, pollMs = 1L,
      sleepFn = ms => { slept += ms; Thread.sleep(2) },
      log = _ => ())
    assert(got == 20.0)
    assert(Bench.contendedAt(got, 32),
      "the caller records contended:true when the wait runs out")
    assert(slept <= 10L, "the wait must respect the deadline")
  }

  test("a calm start never waits") {
    var slept = 0L
    val got = Bench.waitForCalm(() => 0.5, cpus = 32,
      maxWaitMs = 60000L, pollMs = 10000L, sleepFn = slept += _,
      log = _ => ())
    assert(got == 0.5 && slept == 0L)
  }
}
