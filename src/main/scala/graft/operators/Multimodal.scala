package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{QueryDef, Stable}
import graft.tables.Tables

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode/feature-extract as
  * distributed per-partition batch work.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS STUBBED
  * (deterministic fake features, clearly marked) — what's real and tested is
  * the Spark-side plumbing: binary column handling, schema, chunking,
  * partition-batched execution, and the exchange-free plan shape (all
  * per-row map work).
  *
  * The testdata has no binary column, so the demo payload is the document
  * text encoded as bytes; the oracle chunks the ASCII-equivalent string
  * (byte-identical for this corpus), while the Spark side keeps true
  * BinaryType intermediates.
  */
object Multimodal {

  import TextOps.polyHashSql

  private val blob = col("text").cast("binary")

  /** m01 — typed metadata for an opaque binary payload: byte length, leading
    * magic bytes, 64-byte chunk count, and a STUB content feature. */
  val m01BinaryMeta = QueryDef(
    "m01_multimodal_meta",
    s"""SELECT doc_id,
       |  octet_length(encode(text)) AS n_bytes,
       |  lower(hex(encode(substring(text, 1, 4)))) AS magic_hex,
       |  CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_chunks,
       |  ${polyHashSql("substring(text, 1, 32)")} AS stub_feature
       |FROM documents""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      length(blob).cast("long").as("n_bytes"),
      lower(hex(substring(blob, 1, 4))).as("magic_hex"),
      ceil(length(blob) / 64.0).cast("long").as("n_chunks"),
      // STUB: stands in for a real image/audio feature extractor
      TextOps.polyHash(substring(col("text"), 1, 32)).as("stub_feature"))
  }

  private val FrameBytes = 32
  private val SampleEvery = 4

  /** m02 — frame sampling: split the payload into fixed 32-byte frames, keep
    * every 4th, fingerprint each. Pure per-row array work → explode; no
    * shuffle, embarrassingly parallel at any scale. */
  val m02FrameSample = QueryDef(
    "m02_frame_sample",
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |         CAST(ceil(octet_length(encode(text)) / $FrameBytes.0) AS BIGINT) AS n_frames
       |  FROM documents)
       |SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, $SampleEvery)) AS frame_idx,
       |       md5(substring(text, CAST(unnest(generate_series(0, n_frames - 1, $SampleEvery)) * $FrameBytes + 1 AS INTEGER), $FrameBytes)) AS frame_md5
       |FROM f""".stripMargin) { (s, d) =>
    val nFrames = ceil(length(blob) / lit(FrameBytes.toDouble)).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), blob.as("payload"), nFrames.as("n_frames"))
      // zero-length payloads: Spark's sequence(0, -1, 4) throws "Illegal
      // sequence boundaries" while the oracle's generate_series just yields
      // no rows — filter to match (a 0-frame doc contributes nothing).
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(SampleEvery.toLong)))
          .as("frame_idx"),
        col("payload"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(col("payload").substr(
          (col("frame_idx") * FrameBytes + 1).cast("int"), lit(FrameBytes)))
          .as("frame_md5"))
  }

  /** The library API for real decoders: batch the binary column through a
    * per-partition featurizer (the Scala analog of `mapInPandas` — one
    * call per batch of rows, so model/codec init amortizes across the
    * partition). `decode` is pluggable; [[stubDecoder]] is the deterministic
    * fake used where codecs are unavailable.
    */
  def featurize(
      df: DataFrame, payloadCol: String, idCol: String,
      decode: Array[Byte] => Array[Double] = stubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      // per-partition init happens here (codec / model load in real use)
      it.map { case (id, bytes) => (id, decode(bytes)) }
    }.toDF(idCol, "features")
  }

  /** STUB decoder: 4 deterministic byte-statistics standing in for a real
    * image/audio feature vector. */
  def stubDecoder(bytes: Array[Byte]): Array[Double] = {
    if (bytes == null || bytes.isEmpty) Array(0.0, 0.0, 0.0, 0.0)
    else {
      val n = bytes.length.toDouble
      var sum = 0L; var min = 255; var max = 0
      bytes.foreach { b => val v = b & 0xff; sum += v; if (v < min) min = v; if (v > max) max = v }
      Array(n, sum / n, min.toDouble, max.toDouble)
    }
  }

  /** m03 — the [[featurize]] mapPartitions path as an oracle-checked query:
    * runs the stub decoder (byte count / mean / min / max) over every
    * payload. The corpus is ASCII, so bytes == codepoints and DuckDB can
    * reproduce the stub's arithmetic exactly — which makes the
    * per-partition-batch execution path itself oracle-checked, not just
    * unit-tested. At scale this is the plan shape real decoders run in:
    * one partition = one decoder init + a tight per-row loop, no shuffle. */
  val m03Featurize = QueryDef(
    "m03_featurize", {
      val cps = "list_transform(split(text, ''), ch -> CAST(unicode(ch) AS BIGINT))"
      s"""SELECT doc_id,
         |  octet_length(encode(text)) AS n_bytes,
         |  ${Stable.sqlR4(s"CAST(list_sum($cps) AS DOUBLE) / octet_length(encode(text))")} AS byte_mean,
         |  CAST(list_min($cps) AS BIGINT) AS byte_min,
         |  CAST(list_max($cps) AS BIGINT) AS byte_max
         |FROM documents""".stripMargin
    }) { (s, d) =>
    featurize(Tables.documents(s, d), payloadCol = "text", idCol = "doc_id")
      .select(
        col("doc_id"),
        element_at(col("features"), 1).cast("long").as("n_bytes"),
        Stable.r4(element_at(col("features"), 2)).as("byte_mean"),
        element_at(col("features"), 3).cast("long").as("byte_min"),
        element_at(col("features"), 4).cast("long").as("byte_max"))
  }

  val all: Seq[QueryDef] = Seq(m01BinaryMeta, m02FrameSample, m03Featurize)
}
