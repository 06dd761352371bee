package graft.sources

import org.apache.spark.sql.SparkSession

/** Session configuration for object-store-backed lakehouses — config
  * parity with the reference's MinIO/S3 wiring (`src/resources.py:97-102`:
  * endpoint + access/secret key + path-style access + the S3A
  * filesystem impl, all sourced from env vars).
  *
  * Only PUBLIC Hadoop S3A keys are used (`fs.s3a.*`, documented in
  * hadoop-aws). The helper sets configuration only — it does not require
  * the hadoop-aws jar on the classpath until an `s3a://` path is actually
  * read, so every operator keeps working against local paths unchanged
  * (all of graft is FS-agnostic: paths flow through
  * `Path.getFileSystem`, never a hardcoded scheme).
  */
object Sessions {

  /** Credentials + endpoint for an S3-compatible object store. */
  final case class ObjectStore(
      endpoint: String,
      accessKey: String,
      secretKey: String,
      pathStyleAccess: Boolean = true)

  /** Read the store config from the same env vars the reference uses
    * (`S3_ENDPOINT_URL`, `AWS_ACCESS_KEY_ID`, `AWS_SECRET_ACCESS_KEY`);
    * None when any is absent — the local-FS fallback.
    */
  def fromEnv(env: Map[String, String] = sys.env): Option[ObjectStore] =
    for {
      endpoint <- env.get("S3_ENDPOINT_URL")
      access <- env.get("AWS_ACCESS_KEY_ID")
      secret <- env.get("AWS_SECRET_ACCESS_KEY")
    } yield ObjectStore(endpoint, access, secret)

  /** Apply the store's S3A configuration to a session builder. Safe to
    * call with None (no-op): the session then resolves only local /
    * default-FS paths.
    */
  def forObjectStore(
      builder: SparkSession.Builder,
      store: Option[ObjectStore]): SparkSession.Builder =
    store.fold(builder) { s =>
      builder
        .config("spark.hadoop.fs.s3a.endpoint", s.endpoint)
        .config("spark.hadoop.fs.s3a.access.key", s.accessKey)
        .config("spark.hadoop.fs.s3a.secret.key", s.secretKey)
        .config("spark.hadoop.fs.s3a.path.style.access", s.pathStyleAccess.toString)
        .config("spark.hadoop.fs.s3a.impl", "org.apache.hadoop.fs.s3a.S3AFileSystem")
        // connection hygiene at scale: bounded retries with fail-fast on
        // credential errors beats the default unbounded backoff when a
        // 1000-executor job hits a misconfigured endpoint
        .config("spark.hadoop.fs.s3a.attempts.maximum", "3")
        .config("spark.hadoop.fs.s3a.connection.establish.timeout", "5000")
    }

  /** Same keys applied to a LIVE session's Hadoop conf (per-job override
    * — e.g. Retention/Lakehouse maintenance pointed at a store while the
    * analytical session stays on the default FS).
    */
  def applyTo(spark: SparkSession, s: ObjectStore): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.endpoint", s.endpoint)
    hc.set("fs.s3a.access.key", s.accessKey)
    hc.set("fs.s3a.secret.key", s.secretKey)
    hc.set("fs.s3a.path.style.access", s.pathStyleAccess.toString)
    hc.set("fs.s3a.impl", "org.apache.hadoop.fs.s3a.S3AFileSystem")
  }
}
