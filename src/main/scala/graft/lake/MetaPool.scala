package graft.lake

import java.util.concurrent.{Executors, ThreadFactory, TimeoutException}
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.{Await, Future, Promise}
import scala.concurrent.duration._

/** Dedicated bounded pool for driver-side metadata parallelism (chunk
  * loads, stats pruning). Deliberately NOT scala's global ExecutionContext:
  * these helpers BLOCK their caller, and blocking a shared pool from code
  * that might itself run on that pool is a thread-starvation deadlock
  * waiting to happen. All entry points are plan-time driver threads — never
  * this pool's own workers — so waiting here cannot self-deadlock, and the
  * finite timeout turns a hung MetaIO backend into a loud error instead of
  * an eternally stuck driver. */
private[graft] object MetaPool {

  /** Generous ceiling for one metadata fan-out: local chunk loads finish in
    * milliseconds; even a million-file table over slow object storage fits
    * comfortably. Anything longer means the backend is hung. */
  val MaxWait: FiniteDuration = 10.minutes

  private val counter = new AtomicInteger()
  private val pool = Executors.newFixedThreadPool(
    math.max(4, Runtime.getRuntime.availableProcessors()),
    new ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-meta-${counter.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })

  /** Apply `work` to every item in parallel on the dedicated pool,
    * preserving order; waits at most [[MaxWait]].
    *
    * Worker bodies catch ALL Throwables (including fatal ones like
    * OutOfMemoryError that `Future {}` would swallow) into the returned
    * future, so a dying worker fails the call immediately instead of
    * stalling it to the timeout with a misleading "backend hung". The
    * no-nested-call invariant — a worker fanning out again would starve
    * the fixed pool until timeout — is enforced, not just documented. */
  def mapAll[A, B](items: Seq[A], what: => String)(work: A => B): Seq[B] = {
    if (Thread.currentThread().getName.startsWith("graft-meta-"))
      throw new IllegalStateException(
        "MetaPool.mapAll called from a MetaPool worker — nested fan-out " +
          "would starve the fixed pool until timeout")
    val futures = items.map { a =>
      val p = Promise[B]()
      pool.execute { () =>
        try p.success(work(a))
        catch { case t: Throwable => p.failure(t) }
      }
      p.future
    }
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.parasitic
    try Await.result(Future.sequence(futures), MaxWait)
    catch {
      case _: TimeoutException =>
        throw new IllegalStateException(
          s"$what did not complete within $MaxWait — " +
            "metadata backend hung or overloaded")
    }
  }
}
