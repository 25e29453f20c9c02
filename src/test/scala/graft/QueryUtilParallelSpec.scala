package graft

import org.scalatest.funsuite.AnyFunSuite

/** `QueryUtil.inParallel` failure semantics (r15 ADVICE / r16 item 7):
  * a failing body must not leak still-running siblings into whatever runs
  * next — streaming gates submit streams through this helper, and an
  * orphan stream would keep consuming during the NEXT bench-timed query.
  */
class QueryUtilParallelSpec extends AnyFunSuite {

  test("results come back in submission order") {
    val out = QueryUtil.inParallel(Seq(
      () => { Thread.sleep(50); "slow" },
      () => "fast",
    ))
    assert(out == Seq("slow", "fast"))
  }

  test("first failure rethrows the body's own exception") {
    val e = intercept[IllegalStateException] {
      QueryUtil.inParallel(Seq[() => Int](
        () => throw new IllegalStateException("boom"),
        () => 2,
      ))
    }
    assert(e.getMessage == "boom")
  }

  test("a failing body does not leave siblings running after the call") {
    val started = new java.util.concurrent.CountDownLatch(1)
    val interrupted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val finishedNormally = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[RuntimeException] {
      QueryUtil.inParallel(Seq[() => Unit](
        () => { // fails as soon as the sibling is known to be running
          started.await(10, java.util.concurrent.TimeUnit.SECONDS)
          throw new RuntimeException("fail fast")
        },
        () => { // long sibling: must be interrupted, not left running
          started.countDown()
          try {
            Thread.sleep(60_000)
            finishedNormally.set(true)
          } catch {
            case _: InterruptedException => interrupted.set(true)
          }
        },
      ))
    }
    // inParallel awaits pool termination before rethrowing, so by the time
    // the exception reaches the caller the sibling has already exited
    assert(interrupted.get(), "sibling body was not interrupted")
    assert(!finishedNormally.get())
  }
}
