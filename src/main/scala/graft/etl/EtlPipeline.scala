package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Orchestrator — the reference's `main()` phase order (EP1, SURVEY §3):
  * phase 1 dimensions in strict dependency order (specialities consume
  * faculties, groups consume specialities, employees consume the department
  * map, auditories consume departments), phase 2 schedule ingest, phase 3
  * gold rebuild. Phase boundaries are materialization points (each job reads
  * the tables the previous one replaced).
  */
object EtlPipeline {

  final case class Inputs(
      currentWeek: Option[String],
      faculties: Option[DataFrame],
      departments: Option[DataFrame],
      specialities: Option[DataFrame],
      studentGroups: Option[DataFrame],
      employees: Option[DataFrame],   // one VariantType column `v` per row
      auditories: Option[DataFrame],
      schedules: Option[DataFrame])   // entity_name, entity_type, raw_json

  def run(ctx: EtlContext, in: Inputs): Unit = {
    // phase 1 — dimensions, strict order (reference main.py:40-47)
    in.currentWeek.foreach(w => DimSync.systemState(ctx, "current_week", lit(w)))
    in.faculties.foreach(DimSync.faculties(ctx, _))
    in.departments.foreach(DimSync.departments(ctx, _))
    in.specialities.foreach(DimSync.specialities(ctx, _))
    in.studentGroups.foreach(DimSync.studentGroups(ctx, _))
    in.employees.foreach(DimSync.employees(ctx, _))
    in.auditories.foreach(DimSync.auditories(ctx, _))
    // phase 2 — facts (main.py:51-52)
    in.schedules.foreach(ScheduleFlatten.ingest(ctx, _))
    // phase 3 — gold (main.py:55)
    Occupancy.rebuild(ctx)
  }

  /** Run against any [[ApiSource]] (S1–S3 boundary): payloads are API-shaped
    * JSON (FIXTURES.md §A) — `/faculties`, `/departments`, `/specialities`,
    * `/student-groups`, `/auditories` — arrays of objects; `/employees/all`
    * — array parsed via VariantType (heterogeneous academicDepartment);
    * `/schedule` — array of {entityName, entityType, data};
    * `/schedule/current-week` — scalar.
    */
  def runFromSource(spark: SparkSession, source: ApiSource,
                    warehouse: String, runTs: java.sql.Timestamp,
                    txLog: Boolean = false): EtlContext = {
    val ctx = EtlContext(spark, warehouse, runTs, txLog)
    import spark.implicits._
    def readArr(endpoint: String,
                schema: org.apache.spark.sql.types.StructType) =
      source.fetch(endpoint).map(payload =>
        spark.read.schema(schema).option("multiLine", "true")
          .json(Seq(payload).toDS()))
    def wholeVariant(endpoint: String): Option[DataFrame] =
      source.fetch(endpoint).map { payload =>
        Seq(payload).toDF("value")
          // malformed payload → zero rows (quarantine), mirroring the
          // reference's skip-entity-and-continue (logic.py:422-424)
          .select(try_parse_json(col("value")).as("doc"))
          .filter(col("doc").isNotNull)
          .select(explode(try_variant_get(col("doc"), "$",
            "array<variant>")).as("v"))
      }

    val schedules = wholeVariant("/schedule").map(df =>
      df.select(
        try_variant_get(col("v"), "$.entityName", "string").as("entity_name"),
        try_variant_get(col("v"), "$.entityType", "string").as("entity_type"),
        to_json(try_variant_get(col("v"), "$.data", "variant")).as("raw_json")))
    val week = source.fetch("/schedule/current-week").map(_.trim)

    run(ctx, Inputs(
      currentWeek = week,
      faculties = readArr("/faculties", Schemas.faculty),
      departments = readArr("/departments", Schemas.department),
      specialities = readArr("/specialities", Schemas.speciality),
      studentGroups = readArr("/student-groups", Schemas.studentGroup),
      employees = wholeVariant("/employees/all"),
      auditories = readArr("/auditories", Schemas.auditory),
      schedules = schedules))
    ctx
  }

  /** Convenience: run against pre-staged JSON files in a directory. */
  def runFromDir(spark: SparkSession, inputDir: String,
                 warehouse: String, runTs: java.sql.Timestamp,
                 txLog: Boolean = false): EtlContext =
    runFromSource(spark, StagedDirSource(inputDir), warehouse, runTs, txLog)
}
