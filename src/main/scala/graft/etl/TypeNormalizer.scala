package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Heuristic type normalization — the Spark restatement of
  * `BaseWriter.convert_column_types` (`pyopenetl/operations.py:120-128`):
  * the reference coerces any column whose name contains `"_at"` to datetime
  * with `errors="coerce"` (unparseable values become NaT), then lets pandas
  * `convert_dtypes()` infer nullable dtypes.
  *
  * Deviations (documented in SURVEY.md §1.2):
  *   - suffix match `endsWith("_at")`, not substring — the reference's
  *     substring match would mis-coerce e.g. a `login_attempts` column
  *     (`operations.py:123`);
  *   - `try_to_timestamp` reproduces `errors="coerce"` (null on failure)
  *     without disabling ANSI mode;
  *   - `convert_dtypes()` needs no analog: Spark columns are nullable by
  *     default and parquet schemas are already typed.
  */
object TypeNormalizer {
  def normalize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq.map { f =>
      if (f.name.endsWith("_at") && f.dataType == StringType)
        try_to_timestamp(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cols: _*)
  }
}
