package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Scale harness for the r17 exact-quantile rework: on a mostly-unique
  * column the (group, value)-histogram plan's sort-window is
  * CORPUS-sized, while bucket-refinement selection
  * ([[graft.operators.Quantiles]]) replaces every sort with bounded
  * aggregation passes. The claims:
  *
  *  - refinement cost grows ~linearly with rows (scan-bound, no sort);
  *  - the histogram plan's cost grows FASTER than rows on near-unique
  *    data (sort of N distinct values), so the gap widens with scale —
  *    the reason madOutliers switched.
  *
  * Measured, not asserted — usage:
  * `sbt "runMain graft.tools.ScaleCheckQuantiles"`. */
object ScaleCheckQuantiles {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("scaleq")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // shuffle-bytes meter: wall-clock on ONE box with no network hides
    // what a cluster pays — the bytes that cross the shuffle are the
    // objective cost the two plans disagree on
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            shuffleBytes.addAndGet(
              e.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def shuffled(f: => Unit): Long = {
      Thread.sleep(1500) // drain the async listener bus
      shuffleBytes.set(0); f
      Thread.sleep(1500)
      shuffleBytes.get()
    }

    def data(rows: Long) = spark.range(0, rows).select(
      (col("id") % 4).cast("string").as("g"),
      // near-unique doubles (money-amount shape): the histogram IS
      // the corpus here
      (col("id") * 7919 % 999999937).cast("double").as("v"))

    def viaRefinement(rows: Long, persist: Boolean): (Double, Long) = {
      spark.conf.set("graft.quantiles.persist", persist.toString)
      try {
        val df = data(rows)
        graft.operators.Stats.madOutliers(df, "g", "v").count() // warm
        var bytes = 0L
        val t = timed {
          bytes = shuffled(
            graft.operators.Stats.madOutliers(df, "g", "v").count())
        }
        (t - 3.0, bytes) // minus the meter's two drain sleeps
      } finally spark.conf.unset("graft.quantiles.persist")
    }

    def viaHistogram(rows: Long): (Double, Long) = {
      // the pre-r17 shape: exact median through the histogram plan's
      // sort-window, twice (median + MAD), then the tally
      val df = data(rows)
      def run(): Unit = {
        val hist = df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
        val med = graft.operators.Percentiles.exactFromHistogramPublic(
          hist, "g", Seq(("_med", 0.5)))
        val absHist = hist.join(med, Seq("g"))
          .select(col("g"), abs(col("v") - col("_med")).as("v"), col("cnt"))
          .groupBy(col("g"), col("v")).agg(sum("cnt").as("cnt"))
        val mad = graft.operators.Percentiles.exactFromHistogramPublic(
          absHist, "g", Seq(("_mad", 0.5)))
        hist.join(med, Seq("g")).join(mad, Seq("g"))
          .groupBy("g")
          .agg(count(lit(1)).as("n"), max("_med").as("m"), max("_mad").as("d"))
          .count()
      }
      run() // warm
      var bytes = 0L
      val t = timed { bytes = shuffled(run()) }
      (t - 3.0, bytes)
    }

    val rungs =
      if (args.contains("big")) Seq(1000000L, 10000000L, 100000000L)
      else Seq(1000000L, 10000000L)
    def mb(b: Long): String = f"${b / 1048576.0}%10.1f MB"
    val rp = rungs.map(n => n -> viaRefinement(n, persist = true))
    rp.foreach { case (n, (t, b)) =>
      println(f"[scaleq] REFINEMENT (persist):   $n%11d rows ${t}%7.2f s, shuffle ${mb(b)}") }
    val rn = rungs.map(n => n -> viaRefinement(n, persist = false))
    rn.foreach { case (n, (t, b)) =>
      println(f"[scaleq] REFINEMENT (rescan):    $n%11d rows ${t}%7.2f s, shuffle ${mb(b)}") }
    val hs = rungs.map(n => n -> viaHistogram(n))
    hs.foreach { case (n, (t, b)) =>
      println(f"[scaleq] HISTOGRAM sort-window:  $n%11d rows ${t}%7.2f s, shuffle ${mb(b)}") }
    rungs.indices.foreach { i =>
      println(f"[scaleq] at ${rungs(i)}%11d rows: shuffle ratio " +
        f"${hs(i)._2._2.toDouble / math.max(1, rn(i)._2._2)}%9.0fx " +
        "(histogram/refinement) — ONE box hides the network a real " +
        "cluster pays per shuffled byte; refinement's wire cost is " +
        "group×bucket rows per pass regardless of corpus size")
    }

    // r18 dispatch row: adaptiveExactMulti must pick the lower-wire
    // plan at BOTH extremes — refinement on near-unique data, the
    // histogram on a bounded domain — and its shuffled bytes must sit
    // at (probe cost above) the winner's, far under the loser's.
    import graft.operators.Percentiles
    val dispatchRows = 10000000L
    spark.conf.set(Percentiles.MaxHistogramDistinctConf, "1000000")
    try {
      def viaAdaptive(unique: Boolean): (String, Long) = {
        val df =
          if (unique) data(dispatchRows)
          else spark.range(0, dispatchRows).select(
            (col("id") % 4).cast("string").as("g"),
            (col("id") % 1000).cast("double").as("v"))
        val specs = Seq(("p50", "v", 0.5), ("p90", "v", 0.9))
        Percentiles.adaptiveExactMulti(df, "g", specs).collect() // warm
        val chosen = Percentiles.lastDispatch("v")
        val b = shuffled(
          Percentiles.adaptiveExactMulti(df, "g", specs).collect())
        (chosen, b)
      }
      def viaForced(unique: Boolean, refine: Boolean): Long = {
        val df =
          if (unique) data(dispatchRows)
          else spark.range(0, dispatchRows).select(
            (col("id") % 4).cast("string").as("g"),
            (col("id") % 1000).cast("double").as("v"))
        val specs = Seq(("p50", "v", 0.5), ("p90", "v", 0.9))
        val thr = if (refine) "0" else s"${Long.MaxValue}"
        spark.conf.set(Percentiles.MaxHistogramDistinctConf, thr)
        try {
          Percentiles.adaptiveExactMulti(df, "g", specs).collect() // warm
          shuffled(Percentiles.adaptiveExactMulti(df, "g", specs).collect())
        } finally
          spark.conf.set(Percentiles.MaxHistogramDistinctConf, "1000000")
      }
      val (cU, bU) = viaAdaptive(unique = true)
      val fU = viaForced(unique = true, refine = false)
      val (cB, bB) = viaAdaptive(unique = false)
      val fB = viaForced(unique = false, refine = true)
      println(f"[scaleq] DISPATCH near-unique $dispatchRows%11d rows: " +
        f"chose $cU%-10s shuffle ${mb(bU)} vs forced-histogram ${mb(fU)}")
      println(f"[scaleq] DISPATCH 1000-domain $dispatchRows%11d rows: " +
        f"chose $cB%-10s shuffle ${mb(bB)} vs forced-refinement ${mb(fB)}")
      println("[scaleq] the dispatcher must land on the smaller number " +
        "on BOTH lines (probe pass included in its bytes)")
    } finally spark.conf.unset(Percentiles.MaxHistogramDistinctConf)
    spark.stop()
  }
}
