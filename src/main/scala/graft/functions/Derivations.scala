package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar derivations (SURVEY.md §2.8 F1-F13). All pure Catalyst column
  * expressions — no UDFs — so every one stays inside whole-stage codegen.
  */
object Derivations {

  /** F1: separate date + time string columns → one timestamp.
    * Reference `combine_date_time_columns`
    * (`/root/reference/clean_encounterids.py:248-258`) used pandas
    * format inference; Spark pins an explicit format (SURVEY §7.4#3).
    * `concat` (not `concat_ws`) so a null date or time yields a null
    * timestamp — concat_ws would skip the null and feed the ANSI
    * parser an unparseable partial string. */
  def combineDateTime(date: Column, time: Column,
                      fmt: String = "yyyy-MM-dd HH:mm:ss"): Column =
    to_timestamp(concat(date, lit(" "), time), fmt)

  /** F5: age in years from two timestamps (365.25-day years,
    * `ipynb:cell 21`). */
  def ageYears(from: Column, to: Column): Column =
    (unix_timestamp(to) - unix_timestamp(from)) / lit(86400.0 * 365.25)

  /** F6/F9: span between two timestamps in minutes. */
  def spanMinutes(from: Column, to: Column): Column =
    (unix_timestamp(to) - unix_timestamp(from)) / lit(60.0)

  /** F8: minutes → days (`clean_encounterids.py:200`). */
  def minutesToDays(mins: Column): Column = mins / lit(1440.0)

  /** F7: BMI from weight (kg) and height (cm) (`ipynb:cell 21`). */
  def bmi(weightKg: Column, heightCm: Column): Column =
    weightKg.cast("double") / pow(heightCm.cast("double") / lit(100.0), 2)

  /** F10: fractional hour-of-day for clock-time histograms
    * (`ipynb:cell 40`). */
  def hourOfDay(ts: Column): Column =
    hour(ts) + minute(ts) / lit(60.0)

  /** F13: percentage with guaranteed double division
    * (Python-2 float-division guard equivalent). */
  def pct(n: Column, total: Column): Column =
    lit(100.0) * n.cast("double") / total.cast("double")

  /** P8: EAV value coalescing — string-typed attributes take
    * `valueString`, numeric ones `valueNumber` (`ipynb:cell 51`). */
  def eavValue(attributeId: Column, stringIds: Seq[Int],
               valueString: Column, valueNumber: Column): Column =
    when(attributeId.isin(stringIds: _*), valueString)
      .otherwise(valueNumber.cast("string"))

  /** P12: lenient numeric parse — junk → null (`pd.to_numeric(...,
    * errors='coerce')`, `ipynb:cell 65`). */
  def lenientDouble(c: Column): Column = c.try_cast("double")
}
