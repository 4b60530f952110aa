package graft.operators

import graft.{Fixtures, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The decode envelope — the engine's version of the reference's
  * `ConsumerMessage[Result, T] = EnvT[ByteRecord, Either[Throwable, *], T]`
  * (/root/reference/src/main/scala/com/iravid/fs2/kafka/model/package.scala:12,16
  * and EnvT.scala:5): a decoded payload annotated with source metadata, where
  * decode FAILURES STAY IN-STREAM (RecordStream.scala:277-278 — the
  * deserialize pipe emits `Either`, it never drops), and the user decides.
  *
  * Spark shape: `payload STRUCT<...>, error STRING` — error is the raw input
  * on decode failure, NULL on success. Filtering `error IS NULL` reproduces
  * the reference's `collect { case EnvT(m, Right(t)) => ... }` idiom
  * (streams/Tables.scala:25-27).
  */
object Envelope {

  /** Decode a JSON string column into `payload` + `error` without dropping
    * rows. `from_json` is codegen-friendly and null-safe; a malformed input
    * yields a NULL payload and the raw input in `error`. Output schema =
    * input columns minus `jsonCol`, plus `payload STRUCT<...>, error STRING`
    * (so a source column literally named "payload" can be decoded too).
    */
  def decodeJson(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val raw = col(jsonCol)
    // PERMISSIVE from_json yields an all-null struct (not NULL) on malformed
    // input, so route failures through the corrupt-record channel instead.
    val corrupt = "_graft_corrupt"
    val withCorrupt = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    val decoded = from_json(raw, withCorrupt,
      Map("columnNameOfCorruptRecord" -> corrupt))
    val others = df.columns.filterNot(_ == jsonCol).map(col).toSeq
    df.select(others :+ decoded.dropFields(corrupt).as("payload") :+
      decoded.getField(corrupt).as("error"): _*)
  }

  /** Fallback decode composition — the reference's `MonadError`-based
    * decoder alternative (`KafkaDecoder.scala:19-22`: `handleErrorWith`
    * chains a second decoder when the first fails) as a `coalesce` over
    * try-decodes: try `primary`, else try `legacy` lifted through `migrate`,
    * else NULL payload with the raw input in `error`.
    *
    * A decode "fails" when the JSON is malformed (corrupt-record channel) OR
    * none of the schema's fields materialize — the strict interpretation a
    * schema'd decoder implies (a v1 record parsed with the v2 schema yields
    * an all-null struct, which must fall through to the v1 decoder, not
    * succeed vacuously).
    *
    * CONTRACT: under this strictness a VALID record whose schema fields are
    * all legitimately null (e.g. `{"id":null,"name":null}`) is
    * indistinguishable from a schema mismatch — it falls through to the
    * legacy decoder and, if that also yields all nulls, to the error
    * channel. This diverges from plain `from_json` (which would return the
    * all-null struct as success) and is the deliberate price of supporting
    * schema fallback at all; ensure at least one field of each schema is
    * effectively non-nullable in practice, or add a required discriminator
    * field before relying on fallback routing.
    */
  def decodeFallback(df: DataFrame, rawCol: String, primary: StructType,
      legacy: StructType, migrate: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    val corrupt = "_graft_corrupt"
    def tryDecode(sch: StructType): org.apache.spark.sql.Column = {
      val d = from_json(col(rawCol),
        sch.add(corrupt, org.apache.spark.sql.types.StringType),
        Map("columnNameOfCorruptRecord" -> corrupt))
      val anyField = sch.fieldNames.map(f => d.getField(f).isNotNull)
        .reduce(_ || _)
      when(d.getField(corrupt).isNull && anyField, d.dropFields(corrupt))
    }
    // migrate() typically builds a struct from the legacy fields, which on a
    // NULL input would produce a struct-of-nulls (not NULL) and vacuously
    // win the coalesce — guard it so decode failure stays NULL.
    val legacyDecoded = tryDecode(legacy)
    val payload = coalesce(tryDecode(primary),
      when(legacyDecoded.isNotNull, migrate(legacyDecoded)))
    val others = df.columns.filterNot(_ == rawCol).map(col).toSeq
    df.select(others :+ payload.as("payload") :+
      when(payload.isNull, col(rawCol)).as("error"): _*)
  }

  // ---------------------------------------------------------------- q27
  // Decode-as-projection (reference A3) over events.props, error channel
  // intact. Scalar extraction via get_json_object keeps the whole row
  // pipeline inside whole-stage codegen.
  private def q27(s: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    Fixtures.events(s, dir)
      .select(col("event_id"), k.as("k"),
        when(k.isNull, col("props")).as("err"))
      .orderBy(col("event_id"))
  }

  private val q27Sql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  CASE WHEN json_extract_string(props, '$.k') IS NULL THEN props END AS err
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q53
  // Binary codec round-trip as a query (A26): encode (len-prefixed utf8,
  // int32 BE, bool byte) from fixture columns, decode it back, emit the
  // fields. The oracle computes the fields directly — so the hash check
  // proves decode ∘ encode = id on real data, not just in a unit test.
  private def q53(s: SparkSession, dir: String): DataFrame = {
    val enc = graft.functions.BinaryRecordDecode.encodeCol(
      substring(col("text"), 1, 10),
      col("n_chars").cast("int"),
      pmod(col("n_chars"), lit(2)) === 0)
    Fixtures.documents(s, dir)
      .select(col("doc_id"), graft.functions.BinaryRecordDecode.decode(enc).as("r"))
      .select(col("doc_id"), col("r.i").as("i"), col("r.k").as("k"),
        col("r.bla").as("bla"))
      .orderBy(col("doc_id"))
  }

  private val q53Sql =
    """SELECT doc_id, substring(text, 1, 10) AS i, CAST(n_chars AS INT) AS k,
      |  (n_chars % 2 = 0) AS bla
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q54
  // Fallback decode as a query (A26, KafkaDecoder.scala:19-22): half the
  // rows carry the current JSON schema, half the legacy one; decodeFallback
  // must route each through the right decoder and migrate legacy into the
  // current shape. Oracle computes the merged result directly.
  private def q54(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val v2 = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val v1 = StructType(Seq(StructField("uid", LongType), StructField("label", StringType)))
    val raw = when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit("{\"id\": "), col("doc_id").cast("string"),
        lit(", \"name\": \""), col("lang"), lit("\"}")))
      .otherwise(
        concat(lit("{\"uid\": "), col("doc_id").cast("string"),
          lit(", \"label\": \""), col("source"), lit("\"}")))
    val df = Fixtures.documents(s, dir).select(col("doc_id"), raw.as("raw"))
    decodeFallback(df, "raw", v2, v1,
      lc => struct(lc.getField("uid").as("id"), lc.getField("label").as("name")))
      .select(col("doc_id"), col("payload.id").as("id"), col("payload.name").as("name"))
      .orderBy(col("doc_id"))
  }

  private val q54Sql =
    """SELECT doc_id, doc_id AS id,
      |  CASE WHEN doc_id % 2 = 0 THEN lang ELSE source END AS name
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q27_decode_envelope", q27, Some(q27Sql)),
    GraftQuery("q53_codec_roundtrip", q53, Some(q53Sql)),
    GraftQuery("q54_decode_fallback", q54, Some(q54Sql)))
}
