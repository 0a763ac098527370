package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.F

/** T5 — the periodic repricing engine (reference PRICEBOT_SPEC_V2.md:
  * 92-100 + run/route.ts:25-41): each observed batch of competitor
  * offers is reduced to the lowest competitor per SKU, joined with the
  * per-SKU pricebot settings, run through the target-price formula
  * (clamp + hysteresis, X18) after dropping ignored merchants (F6), and
  * every *changed* price becomes an action record appended to a JSONL
  * decision log (K6).
  *
  * `foreachBatch` is the right primitive: repricing is a per-trigger
  * decision over the batch's aggregate (lowest competitor), not
  * per-event state — so the batch body is ordinary DataFrame code and
  * the settings dimension broadcasts per trigger.
  */
object Repricer {

  /** One observed competitor offer in the landing stream. */
  val offerSchema: StructType = StructType(Seq(
    StructField("sku", LongType),
    StructField("merchant", StringType),
    StructField("price", DoubleType)))

  /** Settings dimension: sku, current_price, min_price, max_price, step. */
  def computeActions(offers: DataFrame, settings: DataFrame,
                     ignoredMerchants: Seq[String]): DataFrame = {
    val lowest = offers
      .filter(col("price") > 0)
      .filter(!col("merchant").isin(ignoredMerchants: _*))
      .groupBy("sku")
      .agg(min(col("price")).as("lowest_comp"))
    lowest.join(broadcast(settings), Seq("sku"))
      .select(col("sku"), col("current_price"), col("lowest_comp"),
        F.targetPrice(col("current_price"), col("lowest_comp"),
          col("min_price"), col("max_price"), col("step")).as("target_price"))
      .filter(col("target_price") =!= col("current_price"))
  }

  /** Start the streaming repricer over an NDJSON offers landing dir. */
  def start(spark: SparkSession, landingDir: String, settings: DataFrame,
            ignoredMerchants: Seq[String], actionsDir: String,
            checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(offerSchema)
      .option("maxFilesPerTrigger", 1)
      .json(landingDir)
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        computeActions(batch, settings, ignoredMerchants)
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Append).json(actionsDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
