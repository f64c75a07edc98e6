package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark implementation + (when
  * SQL-expressible) a DuckDB oracle over the same parquet tables. The driver
  * sorts columns by name before hashing, but NAMES and value types must match
  * exactly (BASELINE.md t2 gate).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QuerySet {
  def all: Seq[QueryDef]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  final def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** Stable scratch warehouse roots for lifecycle queries, keyed on
  * (tag, input dir): bench reps and verify passes invoke each query many
  * times, and a fresh `createTempDirectory` per invocation would leak a
  * full warehouse copy of the query's tables every rep (ADVICE r6). One
  * reused root per (tag, sfDir); each invocation drops its tables first —
  * which the multi-run lifecycle queries REQUIRE anyway (run 1 must CTAS
  * from clean state, not merge into a previous invocation's leftovers).
  */
object Scratch {
  /** One scratch warehouse per (tag, sfDir) PER JVM: reuse across bench
    * reps/warmups inside a run (the ADVICE r6 temp-dir leak), but never
    * shared between concurrently running JVMs — a test pass and a bench
    * resolving to the same path would drop each other's live lifecycle
    * tables mid-read. The per-process dir is bounded by process count,
    * not invocation count.
    */
  /** Delete a streaming checkpoint under the scratch warehouse so a
    * repeat invocation (bench warmup/reps share the per-JVM scratch dir)
    * re-ingests from offset zero instead of silently no-op'ing against
    * committed offsets — the streaming twin of the table drops above.
    */
  def resetCheckpoint(wh: graft.engine.Warehouse, name: String): Unit = {
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete(); ()
    }
    val d = new java.io.File(s"${wh.root}/_checkpoints/$name")
    if (d.exists()) del(d)
  }

  def warehouse(tag: String, sfDir: String, s: SparkSession,
      tables: Seq[String]): graft.engine.Warehouse = {
    val root = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_scratch_${tag}_${java.lang.Integer.toHexString(sfDir.hashCode)}" +
        s"_p${ProcessHandle.current().pid()}")
    val wh = new graft.engine.Warehouse(root.toString, s)
    tables.foreach(wh.drop)
    wh
  }
}
