package graft.pipeline

import java.util.concurrent.atomic.AtomicBoolean

import org.scalatest.funsuite.AnyFunSuite

import graft.kmeans.SparkTestSession

/** Executor-side one-shot failure injector: the FIRST task attempt that
  * reaches it throws; every later attempt passes. local-mode executors
  * share the JVM, so static state is visible to tasks.
  */
object FailOnce {
  val tripped = new AtomicBoolean(false)
  def reset(): Unit = tripped.set(false)
}

/** C2 (reference `master.py:102-115,145-161`): the reference retries a
  * failed mapper/reducer forever, reassigning round-robin. In Spark the
  * same concern is the scheduler's task-retry policy
  * (`spark.task.maxFailures`, stage resubmission) — config, not engine
  * code. This spec DEMONSTRATES it: with maxFailures=2 (session master
  * `local[4, 2]`), a task whose first attempt throws is retried and the
  * job still yields the correct result.
  */
class FaultToleranceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("C2: injected first-attempt task failure is retried and succeeds") {
    FailOnce.reset()
    val df = (1L to 100L).toDF("v").repartition(1)
    val summed = df
      .mapPartitions { it =>
        if (!FailOnce.tripped.getAndSet(true))
          throw new RuntimeException("injected one-shot task failure (C2 demo)")
        it
      }(df.encoder)
      .agg(org.apache.spark.sql.functions.sum($"v"))
      .as[Long]
      .head()
    assert(FailOnce.tripped.get, "the injector never fired")
    assert(summed === 5050L)
  }

  test("C2: a failure on every attempt exhausts maxFailures and fails the job") {
    val e = intercept[org.apache.spark.SparkException] {
      val df = (1L to 10L).toDF("v").repartition(1)
      df.mapPartitions { _ =>
          if (true) throw new RuntimeException("always fails (C2 demo)")
          Iterator.empty[org.apache.spark.sql.Row]
        }(df.encoder)
        .count()
    }
    assert(e.getMessage.contains("always fails"))
  }
}
