package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.tables.GraftCatalog")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    // force FULL evaluation: the noop sink consumes every output row and
    // column, so projections/sorts/regexes are really timed. A bare
    // count() lets Catalyst prune computed columns and the measurement
    // degenerates to a scan count for expression-heavy queries.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // untimed warmup: JIT/codegen/classloading, so the first timed query
    // measures steady-state execution rather than JVM startup
    try run(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // Adaptive repetition, report the per-query MIN of agreeing samples.
    // The sandbox host exhibits periodic multi-minute global stalls
    // (every query 10-80x slower, CPU idle — hypervisor-level, verified
    // with vmstat + per-query wall-clock stamps across five runs
    // hitting disjoint query sets); a single pass randomly charges
    // whichever queries sat in the stall window. Scheme: measure every
    // query twice in differently-shuffled orders (so a periodic stall
    // window covers different queries each round); any query whose two
    // samples disagree by >1.5x gets re-measured (up to 4 samples) —
    // stall inflation is 10x+, so two agreeing samples are steady-state
    // with high confidence, while genuine cost reproduces and converges
    // immediately.
    // local-iteration filter: SPARK_GRAFT_ONLY="q1_agg,q_distinct_pairs"
    // times just those queries (driver never sets it → full suite)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val rng = new scala.util.Random(42)
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector())
    def converged(ts: Vector[Double]): Boolean = {
      val ok = ts.filter(_ >= 0).sorted
      ok.size >= 2 && ok(1) <= ok(0) * 1.25
    }
    var round = 0
    var pending = names
    while (round < 4 && pending.nonEmpty) {
      round += 1
      for ((name, fn) <- rng.shuffle(pending)) {
        val t0 = System.nanoTime()
        // a failed query must not masquerade as a fast one: record -1
        val ok = try { run(fn(spark, sfDir)); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        val secs = (System.nanoTime() - t0) / 1e9
        // progress to stderr (driver reads only the stdout JSON line):
        // wall-clock stamps make external stalls attributable post-hoc
        System.err.println(f"[bench] ${java.time.Instant.now()} round$round $name%-24s $secs%8.2f s")
        samples(name) = samples(name) :+ (if (ok) secs else -1.0)
      }
      pending =
        if (round == 1) names // always take a second, shuffled pass
        else names.filter { case (n, _) =>
          val ts = samples(n)
          !converged(ts) && ts.count(_ >= 0) < 4 && ts.exists(_ >= 0)
        }
    }
    val results = names.map { case (name, _) =>
      val ts = samples(name).filter(_ >= 0)
      name -> (if (ts.isEmpty) -1.0 else ts.min)
    }.toMap
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.US, v)
    def entriesJson(es: Seq[(String, Double)]): String =
      es.map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // complete record to a repo file — per-round evidence that survives
    // any log truncation. `samples` carries EVERY per-query wall time in
    // measurement order (element 0 = the query's FIRST execution in
    // this JVM), and `cold` singles out queries whose first run exceeds
    // their steady-state min by >1.5x — the codegen-compile-dominated
    // set (q_mad's reused-histogram plan compiles ~4.5 s once) — so
    // cold-vs-steady never has to be re-litigated from raw logs.
    val samplesJson = samples.toMap.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\":" + v.map(r3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val coldJson = samples.toMap.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      val ok = v.filter(_ >= 0)
      if (ok.size >= 2 && ok.head > ok.min * 1.5)
        Some("\"" + k + "\":{\"first\":" + r3(ok.head) +
          ",\"min\":" + r3(ok.min) + "}")
      else None
    }.mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""queries":${entriesJson(results.toSeq.sortBy(-_._2))},""" +
      s""""samples":$samplesJson,"cold":$coldJson,""" +
      s""""sf":"$sfDir"}"""
    val fullPath = "BENCH_FULL.json"
    val w = new java.io.PrintWriter(fullPath, "UTF-8")
    try w.println(fullJson) finally w.close()
    println(fullJson)
    // the harness that collects this output keeps only the LAST ~2000
    // characters of stdout: a 170-query map is ~5 kB, so the line
    // above arrives decapitated and unparseable. The FINAL line is a
    // compact summary sized to survive that window whole — total,
    // then the slowest queries until the byte budget runs out, plus a
    // pointer to the full record.
    val budget = 1500
    val sorted = results.toSeq.sortBy(-_._2)
    val kept = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    var used = 0
    sorted.foreach { case (k, v) =>
      val cost = k.length + 12
      if (used + cost <= budget) { kept += ((k, v)); used += cost }
    }
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""n":${results.size},"queries":${entriesJson(kept.toSeq)},""" +
      s""""omitted":${results.size - kept.size},"full":"$fullPath",""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
