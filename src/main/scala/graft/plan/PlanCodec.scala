package graft.plan

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON codec for migration plans.
  *
  * Parses both plan shapes from the reference: the single-job object
  * (`/root/reference/README.md:24-45`) and the sequential envelope with a
  * `Jobs` array (`README.md:48-90`). Tolerates the quirks the reference's
  * Lambda tolerates: UTF-8 BOM prefix (`routing/lambda_function.py:21-23`),
  * numeric fields arriving as strings (`routing/lambda_function.py:199-202`
  * stringifies NumPartitions), and `" "`-blank `ExpectedAmountOfRecords`
  * (`postprocess/lambda_function.py:77`).
  */
object PlanCodec {

  def parse(raw: String, originFile: Option[String] = None): MigrationPlan = {
    val clean = stripBom(raw)
    val json = JsonMethods.parse(clean)
    val sequential = bool(json \ "SequentialMultipleParts").getOrElse(false)
    val jobs = json \ "Jobs" match {
      case JArray(arr) if sequential && arr.nonEmpty =>
        // Envelope fields are shared; each Jobs entry overrides per-part
        // fields — same promotion the routing Lambda does one part at a
        // time (routing/lambda_function.py:41-57), done eagerly here.
        arr.map(j => specFrom(json.merge(j), originFile))
      case _ => List(specFrom(json, originFile))
    }
    MigrationPlan(jobs.toVector, sequential)
  }

  def parseFile(path: java.nio.file.Path): MigrationPlan =
    parse(java.nio.file.Files.readString(path), Some(path.getFileName.toString))

  private def stripBom(s: String): String =
    if (s.nonEmpty && s.charAt(0) == '﻿') s.substring(1) else s

  private def specFrom(j: JValue, originFile: Option[String]): ExtractionSpec =
    ExtractionSpec(
      SourceName = str(j \ "SourceName").getOrElse(""),
      SourceDatabase = str(j \ "SourceDatabase").getOrElse(""),
      SourceSchema = str(j \ "SourceSchema").getOrElse(""),
      SourceTable = str(j \ "SourceTable").getOrElse(""),
      Active = bool(j \ "Active").getOrElse(true),
      Query = str(j \ "Query").getOrElse(""),
      ExpectedAmountOfRecords = long(j \ "ExpectedAmountOfRecords"),
      NumPartitions = long(j \ "NumPartitions").map(_.toInt),
      LowerBound = str(j \ "LowerBound").filter(_.trim.nonEmpty),
      UpperBound = str(j \ "UpperBound").filter(_.trim.nonEmpty),
      ColumnForPartitioningOnSpark =
        str(j \ "ColumnForPartitioningOnSpark").filter(_.trim.nonEmpty),
      ColumnForPartitioningOnS3 = str(j \ "ColumnForPartitioningOnS3"),
      JobName = str(j \ "JobName"),
      WorkerType = str(j \ "WorkerType"),
      NumberOfWorkers = long(j \ "NumberOfWorkers").map(_.toInt),
      MigrationPart = long(j \ "MigrationPart").map(_.toInt).getOrElse(1),
      JDBCConnectionString = str(j \ "JDBCConnectionString"),
      CredentialsSecretArn = str(j \ "CredentialsSecretArn"),
      OriginFile = originFile
    )

  // Lenient scalar extraction: numbers-as-strings and strings-as-numbers
  // both work; blank strings mean "unset".
  private def str(j: JValue): Option[String] = j match {
    case JString(s) => Some(s)
    case JInt(i)    => Some(i.toString)
    case JLong(i)   => Some(i.toString)
    case JDouble(d) => Some(d.toString)
    case JBool(b)   => Some(b.toString)
    case _          => None
  }
  private def long(j: JValue): Option[Long] = j match {
    case JInt(i)     => Some(i.toLong)
    case JLong(i)    => Some(i)
    case JDouble(d)  => Some(d.toLong)
    case JDecimal(d) => Some(d.toLong)
    case JString(s) if s.trim.nonEmpty =>
      scala.util.Try(s.trim.toLong).toOption
    case _ => None
  }
  private def bool(j: JValue): Option[Boolean] = j match {
    case JBool(b)   => Some(b)
    case JString(s) => Some(s.trim.equalsIgnoreCase("true"))
    case _          => None
  }
}
