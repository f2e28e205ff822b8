package graft.etl

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** S1–S3 ingestion boundary (ref `/root/reference/iis_etl/client.py:25-63`).
  *
  * The reference pulls every input from an HTTP API with retry/backoff (S2,
  * `client.py:25-29`: 5 attempts, exponential 2–20 s) and a bounded-
  * concurrency semaphore (S3, `client.py:31`). Both are DRIVER-side
  * concerns — they happen before any data reaches the engine — so the
  * engine consumes this trait: one raw JSON payload per endpoint. A real
  * deployment implements it with an HTTP client (that impl carries the
  * retry policy and the semaphore; large fan-outs stage responses to object
  * storage instead of driver memory); this environment has no network, so
  * the default implementation reads pre-staged files.
  *
  * Endpoint names mirror the reference client verbatim so a drop-in HTTP
  * implementation is a mechanical port of `client.py:38-63`.
  */
trait ApiSource {
  /** Raw JSON payload for an endpoint; None when unavailable (the pipeline
    * skips that sync phase, reference `main.py` behavior on partial runs).
    */
  def fetch(endpoint: String): Option[String]
}

/** Default staged-directory implementation: endpoint → file in `dir`. */
final case class StagedDirSource(dir: String) extends ApiSource {
  private val files = Map(
    "/faculties" -> "faculties.json",
    "/departments" -> "departments.json",
    "/specialities" -> "specialities.json",
    "/student-groups" -> "student-groups.json",
    "/employees/all" -> "employees.json",
    "/auditories" -> "auditories.json",
    "/schedule/current-week" -> "current-week.json",
    "/schedule" -> "schedules.json")

  override def fetch(endpoint: String): Option[String] =
    files.get(endpoint).flatMap { f =>
      val p = Paths.get(dir, f)
      if (Files.exists(p)) Some(new String(Files.readAllBytes(p), UTF_8))
      else None
    }
}
