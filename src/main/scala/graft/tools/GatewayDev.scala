package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev main: boot a gateway with one published series on a fixed port
  * (default 18080, env GRAFT_DEV_PORT) for manual/browser driving of
  * the HTTP surface — /docs UI, exports, PromQL.
  */
object GatewayDev {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.TempDirs.createPath("graft_dev_store")
    val store = new graft.store.SensorStore(spark, root)
    val gw = new graft.http.Gateway(spark, store, "graft-dev")
    val port = gw.start(
      sys.env.getOrElse("GRAFT_DEV_PORT", "18080").toInt)
    // seed one float series through the real publish edge
    val csv = "datetime,sensor_name,value\n" +
      "2024-01-01T00:00:00Z,devtemp,1.5\n" +
      "2024-01-01T00:00:01Z,devtemp,2.5\n"
    val req = java.net.http.HttpRequest
      .newBuilder(new java.net.URI(s"http://127.0.0.1:$port/publish"))
      .header("content-type", "text/csv")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(csv))
      .build()
    val code = java.net.http.HttpClient.newHttpClient()
      .send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      .statusCode()
    println(s"GATEWAY_READY port=$port seed_publish=$code")
    Thread.sleep(Long.MaxValue)
  }
}
