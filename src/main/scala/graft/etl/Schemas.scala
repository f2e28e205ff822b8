package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas — input (API JSON) and warehouse tables.
  *
  * The reference's storage schema is fixed (`/root/reference/iis_etl/
  * models.py:10-125`) while its *input* is semi-structured JSON parsed
  * defensively (`logic.py:23-50`); we mirror that: every warehouse table has a
  * declared StructType (never inferred), inputs are read with the explicit
  * shapes below (heterogeneous fields — employee `academicDepartment`,
  * schedule `auditories` — go through Spark 4 VariantType instead).
  *
  * Type decisions (SURVEY §1.2): Postgres TIME → seconds-since-midnight
  * IntegerType (sort/compare preserved; Spark 4.1's TimeType is not exposed
  * through the stable DataFrame literal API); JSON passthrough → StringType;
  * TSVECTOR → ArrayType(StringType) of lexemes.
  */
object Schemas {

  // ---- API inputs (FIXTURES.md §A) ----

  val faculty: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("abbrev", StringType)))

  val department: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("nameAbbrev", StringType),
    StructField("abbrev", StringType)))

  val speciality: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("abbrev", StringType),
    StructField("code", StringType),
    StructField("facultyId", LongType),
    StructField("educationForm", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType))))))

  val studentGroup: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("course", IntegerType),
    StructField("calendarId", StringType),
    StructField("educationDegree", IntegerType),
    StructField("numberOfStudents", IntegerType),
    StructField("specialityDepartmentEducationFormId", LongType)))

  val auditory: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("buildingNumber", StructType(Seq(
      StructField("name", StringType)))),
    StructField("buildingNumberId", LongType),
    StructField("note", StringType),
    StructField("capacity", IntegerType),
    StructField("auditoryType", StructType(Seq(
      StructField("name", StringType)))),
    StructField("departmentId", LongType),
    StructField("department", StructType(Seq(
      StructField("idDepartment", LongType),
      StructField("name", StringType),
      StructField("abbrev", StringType))))))

  // ---- Warehouse tables (reference models.py → Spark, SURVEY §1.1) ----

  val systemState: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType),
    StructField("updated_at", TimestampType)))

  val facultiesTable: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("abbr", StringType)))

  val departmentsTable: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("abbr", StringType),
    StructField("url_id", StringType)))

  val specialitiesTable: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("abbr", StringType),
    StructField("code", StringType),
    StructField("faculty_id", LongType),
    StructField("education_form", StringType)))

  /** SCD2: business `id` deliberately non-unique (reference models.py:64). */
  val studentGroupsTable: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("course", IntegerType),
    StructField("speciality_id", LongType),
    StructField("education_degree", IntegerType),
    StructField("number_of_students", IntegerType),
    StructField("valid_from", TimestampType),
    StructField("valid_to", TimestampType)))

  val employeesTable: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("middle_name", StringType),
    StructField("degree", StringType),
    StructField("rank", StringType),
    StructField("photo_link", StringType),
    StructField("url_id", StringType)))

  val departmentsEmployeesTable: StructType = StructType(Seq(
    StructField("department_id", LongType, nullable = false),
    StructField("employee_id", LongType, nullable = false)))

  val auditoriesTable: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("building", StringType),
    StructField("note", StringType),
    StructField("capacity", IntegerType),
    StructField("auditory_type", StringType),
    StructField("department_id", LongType)))

  val scheduleJsonStorageTable: StructType = StructType(Seq(
    StructField("entity_name", StringType, nullable = false),
    StructField("entity_type", StringType, nullable = false),
    StructField("data", StringType),
    StructField("valid_from", TimestampType),
    StructField("valid_to", TimestampType)))

  val scheduleEventsTable: StructType = StructType(Seq(
    StructField("entity_name", StringType, nullable = false),
    StructField("entity_type", StringType, nullable = false),
    StructField("subject", StringType),
    StructField("subject_full", StringType),
    StructField("day_of_week", IntegerType),
    StructField("start_sec", IntegerType),
    StructField("end_sec", IntegerType),
    StructField("week_numbers", ArrayType(IntegerType)),
    StructField("num_subgroup", IntegerType),
    StructField("exact_date", DateType),
    StructField("auditories", ArrayType(StringType)),
    StructField("related_groups", StringType),
    StructField("related_employees", StringType),
    StructField("search_lexemes", ArrayType(StringType))))

  /** Quarantine sink (P5): entities whose payload failed to parse this run —
    * the queryable replacement for the reference's logged-and-skipped errors
    * (logic.py:422-424).
    */
  val scheduleRejectsTable: StructType = StructType(Seq(
    StructField("entity_name", StringType),
    StructField("entity_type", StringType),
    StructField("raw_json", StringType),
    StructField("reason", StringType),
    StructField("rejected_at", TimestampType)))

  val occupancyIndexTable: StructType = StructType(Seq(
    StructField("day_of_week", IntegerType),
    StructField("day_name", StringType),
    StructField("week_num", IntegerType),
    StructField("start_sec", IntegerType),
    StructField("end_sec", IntegerType),
    StructField("auditory_id", LongType),
    StructField("auditory_name", StringType),
    StructField("groups", ArrayType(StringType)),
    StructField("n_events", LongType)))
}
