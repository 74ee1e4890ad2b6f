package graft.lake

import java.util.concurrent.{Executors, ThreadFactory, TimeoutException}
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.{Await, ExecutionContext, Future}
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

  private implicit val ec: ExecutionContext =
    ExecutionContext.fromExecutorService(pool)

  /** Apply `work` to every item in parallel on the dedicated pool,
    * preserving order; waits at most [[MaxWait]]. */
  def mapAll[A, B](items: Seq[A], what: => String)(work: A => B): Seq[B] =
    try Await.result(Future.traverse(items)(a => Future(work(a))), MaxWait)
    catch {
      case _: TimeoutException =>
        throw new IllegalStateException(
          s"$what did not complete within $MaxWait — " +
            "metadata backend hung or overloaded")
    }
}
