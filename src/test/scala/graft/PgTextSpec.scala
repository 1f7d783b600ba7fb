package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the temporal text-encode memo (PgText). The memo is
  * a process-global cross-connection cache, so a non-injective key is
  * silent wire corruption: the wrong timestamp TEXT goes out on DataRow
  * and COPY. These cases run without a SparkSession. */
class PgTextSpec extends AnyFunSuite {

  private def enc(dt: DataType, v: Any): String =
    PgText.textEncode(Row(v), 0, dt)

  test("timestamp memo key is injective across the 500ms/second-boundary collision") {
    // Under the old key (getTime*1e6 + getNanos) these two instants — exactly
    // 500ms apart across a second boundary — collided, so whichever encoded
    // first was served for both.
    val a = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-05T10:00:00.600Z"))
    val b = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-05T10:00:01.100Z"))
    assert(enc(TimestampType, a) === "2024-03-05 10:00:00.6+00:00")
    assert(enc(TimestampType, b) === "2024-03-05 10:00:01.1+00:00")
    // and in the reverse first-seen order, under fresh values
    val c = java.sql.Timestamp.from(java.time.Instant.parse("1999-12-31T23:59:59.900Z"))
    val d = java.sql.Timestamp.from(java.time.Instant.parse("2000-01-01T00:00:00.400Z"))
    assert(enc(TimestampType, d) === "2000-01-01 00:00:00.4+00:00")
    assert(enc(TimestampType, c) === "1999-12-31 23:59:59.9+00:00")
  }

  test("pre-epoch timestamps key correctly (floorDiv, not truncating /1000)") {
    val a = java.sql.Timestamp.from(java.time.Instant.parse("1969-12-31T23:59:59.250Z"))
    assert(enc(TimestampType, a) === "1969-12-31 23:59:59.25+00:00")
  }

  test("timestamp_ntz beyond the Long-nanos range skips the memo, still renders") {
    // PG supports timestamps to year 294276; epochSecond*1e9 overflows Long
    // past ~year 2262, so those values must bypass the memo rather than
    // wrap into colliding keys.
    val far = java.time.LocalDateTime.of(294000, 1, 2, 3, 4, 5)
    val farTxt = enc(TimestampNTZType, far)
    assert(farTxt.contains("294000-01-02 03:04:05"))
    val far2 = java.time.LocalDateTime.of(294000, 1, 2, 3, 4, 6)
    val far2Txt = enc(TimestampNTZType, far2)
    assert(far2Txt.contains("294000-01-02 03:04:06"))
    assert(farTxt !== far2Txt)
  }
}
