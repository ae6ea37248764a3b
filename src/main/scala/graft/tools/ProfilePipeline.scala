package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.{TextFunctions => T}

/** Stage attribution for the composed capstone pipelines at a scaled
  * corpus (VERDICT r11 item 4): times CUMULATIVE prefixes of
  * `pipeline_training_data` / `pipeline_corpus_prep` (exactly the
  * SparkEntry compositions — same operators, same thresholds), so the
  * dominant stage at 100× is a measured difference, not a guess. Each
  * prefix runs twice; the second (warm) time is reported, matching the
  * scale-probe discipline. Usage: ProfilePipeline <dir>.
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale100cd"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = graft.sources.TableCatalog.load(spark, dir, "documents")
    def deduped = {
      val keep = Dedup.dedupExactByFingerprint(docs, "doc_id", "text")
        .select(col("doc_id"))
      docs.join(keep, "doc_id")
    }
    def scored = graft.SparkEntry.qualityScored(deduped)
      .where(col("quality") >= 0.5)

    def warm(name: String)(df: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        val rows = df.count()
        val s = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[pp] $name $s%8.2fs rows=$rows")
        s
      }
      once(); once()
    }

    val scan = warm("scan")(docs)
    val dd = warm("dedup")(deduped)
    val q = warm("dedup+quality")(scored)
    val td = warm("training_data full")(
      graft.SparkEntry.queries("pipeline_training_data")(spark, dir))
    val lang = warm("dedup+quality+langid")(
      scored.where(T.langId(col("text")) === "en"))
    val cp = warm("corpus_prep full")(
      graft.SparkEntry.queries("pipeline_corpus_prep")(spark, dir))
    println(f"[pipeline-attrib] dir=$dir scan=$scan%.2f dedup=$dd%.2f " +
      f"quality=$q%.2f training_data=$td%.2f langid=$lang%.2f " +
      f"corpus_prep=$cp%.2f | stages (diff): dedup=${dd - scan}%.2f " +
      f"quality=${q - dd}%.2f split+agg=${td - q}%.2f " +
      f"langid=${lang - q}%.2f chunk=${cp - lang}%.2f")
    spark.stop()
  }
}
