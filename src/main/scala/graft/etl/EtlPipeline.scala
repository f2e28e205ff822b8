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

  /** Read inputs from a directory of API-shaped JSON files (FIXTURES.md §A):
    * `faculties.json`, `departments.json`, `specialities.json`,
    * `student-groups.json`, `auditories.json` — arrays of objects;
    * `employees.json` — array parsed via VariantType (heterogeneous
    * academicDepartment); `schedules.json` — array of
    * {entityName, entityType, data}; `current-week.json` — scalar.
    */
  def runFromDir(spark: SparkSession, inputDir: String,
                 warehouse: String, runTs: java.sql.Timestamp): EtlContext = {
    val ctx = EtlContext(spark, warehouse, runTs)
    def p(f: String) = s"$inputDir/$f"
    def existing(f: String): Option[String] =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(p(f))))
        Some(p(f)) else None
    def readArr(f: String, schema: org.apache.spark.sql.types.StructType) =
      existing(f).map(path =>
        spark.read.schema(schema).option("multiLine", "true").json(path))
    def wholeVariant(f: String): Option[DataFrame] =
      existing(f).map { path =>
        spark.read.option("wholetext", "true").text(path)
          // malformed file → zero rows (quarantine), mirroring the
          // reference's skip-entity-and-continue (logic.py:422-424)
          .select(try_parse_json(col("value")).as("doc"))
          .filter(col("doc").isNotNull)
          .select(explode(try_variant_get(col("doc"), "$",
            "array<variant>")).as("v"))
      }

    val schedules = wholeVariant("schedules.json").map(df =>
      df.select(
        try_variant_get(col("v"), "$.entityName", "string").as("entity_name"),
        try_variant_get(col("v"), "$.entityType", "string").as("entity_type"),
        to_json(try_variant_get(col("v"), "$.data", "variant")).as("raw_json")))
    val week = existing("current-week.json").map { path =>
      scala.io.Source.fromFile(path, "UTF-8").mkString.trim
    }

    run(ctx, Inputs(
      currentWeek = week,
      faculties = readArr("faculties.json", Schemas.faculty),
      departments = readArr("departments.json", Schemas.department),
      specialities = readArr("specialities.json", Schemas.speciality),
      studentGroups = readArr("student-groups.json", Schemas.studentGroup),
      employees = wholeVariant("employees.json"),
      auditories = readArr("auditories.json", Schemas.auditory),
      schedules = schedules))
    ctx
  }
}
