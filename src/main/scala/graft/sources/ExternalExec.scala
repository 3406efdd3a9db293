package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** EXECUTE web external tables — the reference's command-backed sources
  * (`/root/reference/src/backend/access/external/url_execute.c`;
  * `CREATE EXTERNAL WEB TABLE ... EXECUTE 'cmd' ON ALL | MASTER | N`):
  * the command runs once per segment and each invocation's stdout
  * becomes that segment's rows.
  *
  * Spark mapping: segments are partitions; `RDD.pipe` launches the
  * command per partition and streams its stdout back as records. Each
  * invocation receives its segment id as a line on stdin (the
  * GP_SEGMENT_ID contract — commands that shard their work read it;
  * commands that don't just ignore stdin). `ON MASTER` is
  * `nSegments = 1`. At scale this is the reference's exact execution
  * shape: no data moves to a coordinator, every segment ingests its
  * own command's output in parallel, and the parsed frame feeds the
  * same PERMISSIVE/reject machinery as any other external table.
  */
object ExternalExec {

  /** Raw lines from running `cmd` (via bash -c) on each of `nSegments`
    * partitions; stdin of invocation i is the single line "i". */
  def executeLines(spark: SparkSession, cmd: String,
                   nSegments: Int): Dataset[String] = {
    require(nSegments >= 1, "need at least one segment")
    import spark.implicits._
    spark.createDataset(
      spark.sparkContext
        .parallelize(0 until nSegments, nSegments)
        .map(_.toString)
        .pipe(Seq("bash", "-c", cmd)))
  }

  /** EXECUTE table with a CSV row format: lines parsed against
    * `schemaDdl` (header-less, like the reference's TEXT/CSV external
    * formats). */
  def executeCsv(spark: SparkSession, cmd: String, nSegments: Int,
                 schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).csv(executeLines(spark, cmd, nSegments))
}
