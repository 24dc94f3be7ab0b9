package graft.streaming;

import org.apache.spark.rdd.RDD;
import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.types.StructType;

/**
 * Java bridge to {@code SparkSession.internalCreateDataFrame(rdd, schema,
 * isStreaming = true)} — the constructor every v1 streaming {@code Source}
 * must use for the frames it returns from {@code getBatch} (the streaming
 * engine asserts {@code isStreaming} on them). The method is
 * {@code private[sql]}, a Scala-signature-level restriction that javac
 * does not enforce; this shim is the minimal, explicit crossing point
 * (the same crossing the Delta connector makes by living inside the
 * {@code org.apache.spark.sql} package).
 */
public final class SparkStreamingInternals {
    private SparkStreamingInternals() {}

    public static Dataset<Row> streamingDataFrame(
            SparkSession spark, RDD<InternalRow> rdd, StructType schema) {
        return ((org.apache.spark.sql.classic.SparkSession) spark)
            .internalCreateDataFrame(rdd, schema, true);
    }

    /**
     * The sink-side inverse: re-anchor a micro-batch's already-planned
     * rows ({@code data.queryExecution.toRdd}) as a plain BATCH frame so
     * the sink can push it through ordinary writers — the same move
     * Spark's own ForeachBatchSink makes.
     */
    public static Dataset<Row> batchDataFrame(
            SparkSession spark, RDD<InternalRow> rdd, StructType schema) {
        return ((org.apache.spark.sql.classic.SparkSession) spark)
            .internalCreateDataFrame(rdd, schema, false);
    }
}
