package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Scd2, Upsert}

/** Dimension sync jobs — one per reference sync function, same DAG order.
  *
  * Each job is: defensive parse (Python-falsy coalescing preserved — `'' or x`
  * picks `x`, unlike SQL COALESCE; SURVEY §7 "hard parts") → keyed upsert with
  * the reference's exact per-table partial update-set (SURVEY §2.4 U1–U7) →
  * atomic table replace. All joins against dimensions are broadcast (dims are
  * small by construction; at 100 TB the fact side streams map-side).
  */
object DimSync {

  /** Python-falsy coalesce: null OR empty-after-trim counts as missing
    * (reference `item.get('name') or item.get('nameAbbrev')`, logic.py:89).
    */
  def coalesceFalsy(cols: Column*): Column =
    coalesce(cols.map(c => when(length(trim(c)) > 0, c)): _*)

  /** K/V singleton upsert (U1, logic.py:63-67). */
  def systemState(ctx: EtlContext, key: String, value: Column): Unit = {
    val inc = ctx.spark.range(1).select(
      lit(key).as("key"), value.cast(StringType).as("value"),
      ctx.runTsCol.as("updated_at"))
    val cur = ctx.read("system_state", Schemas.systemState)
    ctx.replace("system_state",
      Upsert(cur, inc, Seq("key"), Seq("value", "updated_at")))
  }

  /** U2 (logic.py:77-81): update-set = name, abbr. */
  def faculties(ctx: EtlContext, input: DataFrame): Unit = {
    val inc = input.select(col("id"), col("name"), col("abbrev").as("abbr"))
    val cur = ctx.read("faculties", Schemas.facultiesTable)
    ctx.replace("faculties", Upsert(cur, inc, Seq("id"), Seq("name", "abbr")))
  }

  /** U3 (logic.py:89-95): name coalesced from two keys, abbr falls back to
    * name[:50], url_id = str(id) and is INSERT-ONLY (frozen on conflict).
    */
  def departments(ctx: EtlContext, input: DataFrame): Unit = {
    val name = coalesceFalsy(col("name"), col("nameAbbrev"))
    val inc = input.select(
      col("id"),
      name.as("name"),
      coalesceFalsy(col("abbrev"), substring(name, 1, 50)).as("abbr"),
      col("id").cast(StringType).as("url_id"))
    val cur = ctx.read("departments", Schemas.departmentsTable)
    ctx.replace("departments",
      Upsert(cur, inc, Seq("id"), Seq("name", "abbr")))
  }

  /** U4 + J4 (logic.py:102-121): specialities referencing an unknown faculty
    * first synthesize an `Unknown Faculty {id}` placeholder parent;
    * education_form is INSERT-ONLY; its display value is the Python-falsy
    * chain name → id → 'Unknown' (logic.py:112-113).
    */
  def specialities(ctx: EtlContext, input: DataFrame): Unit = {
    val curFac = ctx.read("faculties", Schemas.facultiesTable)
    val missing = input.select(col("facultyId").as("id")).distinct()
      .filter(col("id").isNotNull)
      .join(curFac, Seq("id"), "left_anti")
      .select(col("id"),
        concat(lit("Unknown Faculty "), col("id").cast(StringType)).as("name"),
        concat(lit("UF"), col("id").cast(StringType)).as("abbr"))
    if (!missing.isEmpty)
      ctx.replace("faculties", Upsert.insertIfAbsent(curFac, missing, Seq("id")))

    val inc = input.select(
      col("id"), col("name"), col("abbrev").as("abbr"), col("code"),
      col("facultyId").as("faculty_id"),
      coalesceFalsy(col("educationForm.name"),
        col("educationForm.id").cast(StringType), lit("Unknown"))
        .as("education_form"))
    val cur = ctx.read("specialities", Schemas.specialitiesTable)
    ctx.replace("specialities",
      Upsert(cur, inc, Seq("id"), Seq("name", "abbr", "code", "faculty_id")))
  }

  /** A4 + J3 (logic.py:125-171): SCD2 dimension. Groups with an unknown
    * speciality FK are skipped (left-semi, logic.py:140); educationDegree
    * defaults to 1 (logic.py:144). Tracked attrs create versions; only
    * number_of_students changing is a Type 1 in-place update.
    */
  def studentGroups(ctx: EtlContext, input: DataFrame): Unit = {
    val specs = ctx.read("specialities", Schemas.specialitiesTable)
      .select(col("id").as("speciality_id"))
    val snap = input.select(
        col("id"), col("name"), col("course"),
        col("specialityDepartmentEducationFormId").as("speciality_id"),
        coalesce(col("educationDegree"), lit(1)).as("education_degree"),
        col("numberOfStudents").as("number_of_students"))
      .join(broadcast(specs), Seq("speciality_id"), "left_semi")
    val cur = ctx.read("student_groups", Schemas.studentGroupsTable)
    ctx.replace("student_groups",
      Scd2(cur, snap, "id",
        tracked = Seq("name", "course", "speciality_id"),
        type1 = Seq("number_of_students"),
        runTs = ctx.runTsCol))
  }

  /** U5 + J2 + U8 (logic.py:177-216): employees without urlId are skipped;
    * the conflict update-set is ONLY rank/degree/url_id (names and photo are
    * frozen after insert, logic.py:186-194). Department links resolve each
    * `academicDepartment` entry (plain string or {name,abbrev} object,
    * VariantType) against a lower/trim-normalized two-key map name→id ∪
    * abbr→id; the bridge is replaced wholesale per employee (delete+insert).
    *
    * @param input one row per employee with a `v` VariantType column
    */
  def employees(ctx: EtlContext, input: DataFrame): Unit = {
    def f(field: String) = try_variant_get(col("v"), s"$$.$field", "string")
    val parsed = input.select(
      try_variant_get(col("v"), "$.id", "long").as("id"),
      f("firstName").as("first_name"),
      f("lastName").as("last_name"),
      f("middleName").as("middle_name"),
      f("degree").as("degree"),
      f("rank").as("rank"),
      f("photoLink").as("photo_link"),
      f("urlId").as("url_id"),
      try_variant_get(col("v"), "$.academicDepartment", "array<variant>")
        .as("depts"))
      .filter(col("url_id").isNotNull)                  // logic.py:184

    val cur = ctx.read("employees", Schemas.employeesTable)
    ctx.replace("employees",
      Upsert(cur, parsed.drop("depts"), Seq("id"),
        Seq("rank", "degree", "url_id")))

    // two-key lookup map: lower(trim(name)) ∪ lower(trim(abbr)) → dept id
    val d = ctx.read("departments", Schemas.departmentsTable)
    val lookup = d.select(lower(trim(col("name"))).as("k"), col("id"))
      .unionByName(d.select(lower(trim(col("abbr"))).as("k"), col("id")))
      .filter(col("k").isNotNull && length(col("k")) > 0)
      .dropDuplicates("k")
    val links = parsed.select(col("id").as("employee_id"),
        explode_outer(col("depts")).as("dv"))
      .select(col("employee_id"),
        lower(trim(coalesceFalsy(
          try_variant_get(col("dv"), "$.name", "string"),
          try_variant_get(col("dv"), "$.abbrev", "string"),
          try_variant_get(col("dv"), "$", "string")))).as("k"))
      .filter(col("k").isNotNull)
      .join(broadcast(lookup), Seq("k"))                // unknown name → drop
      .select(col("id").as("department_id"), col("employee_id"))
      .distinct()                                       // set-dedup logic.py:199
    val bridge = ctx.read("departments_employees",
      Schemas.departmentsEmployeesTable)
    ctx.replace("departments_employees",
      Upsert.deleteInsert(bridge, links, Seq("employee_id")))
  }

  /** U6 + J5 + U7 + F11 (logic.py:222-269): room display name gets
    * "-building" appended unless already contained; building falls back to
    * "{id} к."; embedded department objects are inserted if absent; an unknown
    * department_id is nulled out. Conflict update-set is ONLY name, capacity.
    */
  def auditories(ctx: EtlContext, input: DataFrame): Unit = {
    val building = coalesceFalsy(
      col("buildingNumber.name"),
      when(col("buildingNumberId").isNotNull,
        concat(col("buildingNumberId").cast(StringType), lit(" к."))))
    val display = when(
      building.isNotNull && !col("name").contains(building),
      concat_ws("-", col("name"), building)).otherwise(col("name"))

    // embedded parents (logic.py:241-251) — insert-if-absent
    val curDepts = ctx.read("departments", Schemas.departmentsTable)
    val embedded = input.filter(col("department.idDepartment").isNotNull)
      .select(col("department.idDepartment").as("id"),
        coalesceFalsy(col("department.name"), col("department.abbrev"))
          .as("name"),
        coalesceFalsy(col("department.abbrev"), col("department.name"))
          .as("abbr"),
        col("department.idDepartment").cast(StringType).as("url_id"))
      .dropDuplicates("id")
    if (!embedded.isEmpty)
      ctx.replace("departments",
        Upsert.insertIfAbsent(curDepts, embedded, Seq("id")))

    // FK validity (logic.py:253-254): unknown department_id → NULL
    val deptIds = ctx.read("departments", Schemas.departmentsTable)
      .select(col("id").as("dept_ok"))
    val inc = input.select(
        col("id"), display.as("name"), building.as("building"),
        col("note"), col("capacity"),
        col("auditoryType.name").as("auditory_type"),
        coalesce(col("department.idDepartment"), col("departmentId"))
          .as("department_id"))
      .join(broadcast(deptIds),
        col("department_id") === col("dept_ok"), "left")
      .withColumn("department_id",
        when(col("dept_ok").isNull, lit(null).cast(LongType))
          .otherwise(col("department_id")))
      .drop("dept_ok")
    val cur = ctx.read("auditories", Schemas.auditoriesTable)
    ctx.replace("auditories",
      Upsert(cur, inc, Seq("id"), Seq("name", "capacity")))
  }
}
