package graft

import org.apache.spark.sql.functions._

/** Spark Connect smoke door (r16 verdict #7 — the last UX-parity gap
  * vs the reference's client surface: gwasDB/app.R serves R dbplyr
  * over a DB CONNECTION, not an in-process library). Here the
  * SparkConnect gRPC service starts against the same SparkContext,
  * a CLIENT session dials sc://localhost and issues SQL against the
  * graft catalog — CREATE/INSERT/SELECT plus a maintenance procedure
  * CALL — and the results must equal the in-JVM spark.sql answers.
  * Everything a notebook / BI tool needs to treat graft as a server:
  * the extensions and the graft catalog registration ride the shared
  * SparkContext conf, so connect-spawned sessions resolve `graft.*`
  * with no side-channel setup; the warehouse root travels in-band as
  * a SET statement on the client session. */
class ConnectSmokeSpec extends SparkSpec {

  test("SQL over a Connect client session ≡ in-JVM spark.sql against the graft catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft_conn_wh").toString
    spark.conf.set("graft.catalog.warehouse", wh)
    // the live SparkConf (getConf clones): the service reads its
    // binding port from the context's own conf at start
    val port = 15901
    org.apache.spark.SparkEnv.get.conf
      .set("spark.connect.grpc.binding.port", port.toString)
    org.apache.spark.sql.connect.service.SparkConnectService
      .start(spark.sparkContext)
    try {
      val client = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port").create()
      try {
        // the warehouse root travels in-band: the connect session is
        // its own session state
        client.sql(s"SET graft.catalog.warehouse=$wh")
        client.sql("CREATE TABLE graft.conn_t AS " +
          "SELECT id AS k, id % 5 AS grp FROM range(0, 100)")
        client.sql("INSERT INTO graft.conn_t " +
          "SELECT id AS k, id % 5 AS grp FROM range(100, 120)")
        val viaConnect = client
          .sql("SELECT grp, count(*) AS n, sum(k) AS s FROM graft.conn_t " +
            "GROUP BY grp ORDER BY grp")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        val inJvm = spark
          .sql("SELECT grp, count(*) AS n, sum(k) AS s FROM graft.conn_t " +
            "GROUP BY grp ORDER BY grp")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(viaConnect == inJvm, s"$viaConnect vs $inJvm")
        assert(viaConnect.map(_._2).sum == 120L)
        // a maintenance procedure over the wire: ANALYZE, then read
        // the NDV back through DESCRIBE DETAIL's TVF surface
        val analyzed = client
          .sql("CALL graft.system.analyze(table => 'conn_t')")
          .collect()
        assert(analyzed.length == 1 && analyzed.head.getLong(0) >= 1L,
          analyzed.mkString(","))
        // time travel over the wire (the append was version 2)
        val v1 = client
          .sql("SELECT count(*) AS n FROM graft.conn_t VERSION AS OF 1")
          .collect().head.getLong(0)
        assert(v1 == 100L, s"time travel over connect: $v1")
      } finally client.close()
    } finally {
      org.apache.spark.sql.connect.service.SparkConnectService
        .stop(None, None)
      spark.sql("DROP TABLE IF EXISTS graft.conn_t")
      spark.conf.unset("graft.catalog.warehouse")
    }
  }
}
