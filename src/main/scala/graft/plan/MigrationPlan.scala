package graft.plan

/** The engine's "query object": a declarative extraction plan.
  *
  * Mirrors the migration-plan JSON of the reference
  * (`/root/reference/README.md:91-113`): one [[ExtractionSpec]] per job, a
  * [[MigrationPlan]] as the envelope for sequential multi-part plans
  * (`README.md:48-90`). Field names keep the reference's JSON spelling so the
  * reference's own plan files parse unchanged.
  */
final case class ExtractionSpec(
    SourceName: String,
    SourceDatabase: String,
    SourceSchema: String,
    SourceTable: String,
    Active: Boolean = true,
    Query: String = "",
    ExpectedAmountOfRecords: Option[Long] = None,
    NumPartitions: Option[Int] = None,
    LowerBound: Option[String] = None,
    UpperBound: Option[String] = None,
    ColumnForPartitioningOnSpark: Option[String] = None,
    ColumnForPartitioningOnS3: Option[String] = None,
    JobName: Option[String] = None,
    WorkerType: Option[String] = None,
    NumberOfWorkers: Option[Int] = None,
    MigrationPart: Int = 1,
    JDBCConnectionString: Option[String] = None,
    CredentialsSecretArn: Option[String] = None,
    OriginFile: Option[String] = None
) {
  /** Idempotency key — same MD5 recipe as the reference
    * (`routing/lambda_function.py:107-111`): md5(table + part + UPPER(TRIM(query))).
    * Deliberately excludes SourceDatabase/SourceSchema for byte-compatibility
    * (inherited behavior, documented in SURVEY.md §7.4).
    */
  def executionHashId: String = PlanHash.hashId(SourceTable, MigrationPart, Query)

  /** Catalog table name in the lake: `{SourceName}_{SourceTable}`
    * (`sybaseiq_extractor.py:163`). */
  def lakeTableName: String = s"${SourceName}_${SourceTable}"

  /** Lake path suffix `{SourceName}/{SourceSchema}/{SourceTable}`
    * (`sybaseiq_extractor.py:160`). */
  def lakePathSuffix: String = s"$SourceName/$SourceSchema/$SourceTable"

  /** True when the plan requests a range-striped parallel read (S1 vs S2,
    * `sybaseiq_extractor.py:283`). */
  def isPartitionedRead: Boolean =
    ColumnForPartitioningOnSpark.exists(_.trim.nonEmpty) &&
      NumPartitions.exists(_ > 0) && LowerBound.isDefined && UpperBound.isDefined

  /** S3 partition column, blank-normalized (`sybaseiq_extractor.py:122`). */
  def s3PartitionColumn: Option[String] =
    ColumnForPartitioningOnS3.map(_.trim).filter(_.nonEmpty)
}

/** Envelope for `SequentialMultipleParts` plans (`README.md:48-90`). Shared
  * fields sit on the envelope; `Jobs` carries the per-part overrides that the
  * reference's routing Lambda promotes one at a time
  * (`routing/lambda_function.py:41-57`).
  */
final case class MigrationPlan(
    specs: Vector[ExtractionSpec],
    sequential: Boolean
) {
  def activeSpecs: Vector[ExtractionSpec] = specs.filter(_.Active)
}

/** Fail-fast plan validation — the engine's analogue of the admission checks
  * scattered through the reference's routing Lambda. Returns human-readable
  * problems; empty = valid.
  */
object PlanValidator {
  def validate(spec: ExtractionSpec): Seq[String] = {
    val problems = Seq.newBuilder[String]
    if (spec.SourceTable.trim.isEmpty) problems += "SourceTable is required"
    if (spec.SourceName.trim.isEmpty) problems += "SourceName is required"
    if (spec.Query.trim.isEmpty) problems += "Query is required"
    if (spec.Query.trim.endsWith(";"))
      problems += "Query must not end with ';' (README.md:101)"
    val partKnobs = Seq(spec.ColumnForPartitioningOnSpark.isDefined,
      spec.NumPartitions.isDefined, spec.LowerBound.isDefined,
      spec.UpperBound.isDefined)
    if (partKnobs.exists(identity) && !partKnobs.forall(identity))
      problems += ("partitioned read requires ALL of " +
        "ColumnForPartitioningOnSpark/NumPartitions/LowerBound/UpperBound")
    if (spec.NumPartitions.exists(_ <= 0))
      problems += "NumPartitions must be positive"
    if (spec.MigrationPart <= 0) problems += "MigrationPart must be >= 1"
    problems.result()
  }

  def validate(plan: MigrationPlan): Seq[String] =
    plan.specs.flatMap(s =>
      validate(s).map(p => s"part ${s.MigrationPart}: $p"))
}

object PlanHash {
  /** md5 hex digest, matching Python's `hashlib.md5(s.encode()).hexdigest()`. */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** The reference's hash recipe (`routing/lambda_function.py:107-111`):
    * `md5(SourceTable + str(MigrationPart) + Query.strip().upper())`.
    * Python semantics are matched explicitly: `strip()` removes Unicode
    * whitespace (Java `trim` only chars <= U+0020) and `upper()` is
    * locale-independent (default-locale `toUpperCase` would diverge under
    * e.g. a Turkish JVM locale), so hash ids stay identical to
    * reference-produced ones for cross-system idempotency. */
  def hashId(table: String, part: Int, query: String): String = {
    // Python str.isspace ⊇ Java isWhitespace (NBSP et al. are isSpaceChar)
    def pySpace(c: Char) = c.isWhitespace || Character.isSpaceChar(c)
    val stripped = query.dropWhile(pySpace)
      .reverse.dropWhile(pySpace).reverse
    md5Hex(table + part.toString +
      stripped.toUpperCase(java.util.Locale.ROOT))
  }
}
