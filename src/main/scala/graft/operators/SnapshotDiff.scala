package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key across two table versions
  * as added / removed / changed / same — the audit step between
  * periodic re-extracts of an upstream system (the reference re-extracts
  * its source tables per study refresh; `/root/reference/
  * dataset_curation.ipynb:cell 0` names the extract files by date range).
  *
  * Spark-first shape: one full-outer equi-join on the key (shuffle on
  * both sides, AQE-sized), presence flags instead of null-probing the
  * key columns (a using-columns full outer join coalesces the keys, so
  * key nullness cannot distinguish the sides), and null-safe `<=>`
  * comparison so a null→value transition counts as a change, not a
  * match.
  */
object SnapshotDiff {

  /** Full-outer diff of `oldDf` vs `newDf` on `keys`, comparing
    * `compareCols`. Returns the coalesced keys, each compared column
    * coalesced new-over-old, and `change_type`.
    *
    * PRECONDITION: `keys` is a primary key of BOTH sides — that is what
    * makes a table a snapshot. A duplicate key would fan out through
    * the full-outer join and corrupt downstream counts (the same hazard
    * [[KeyCorrection.correctKeys]] guards against); assert with
    * `Validation.isUnique` when ingesting untrusted snapshots. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "SnapshotDiff.diff needs at least one compared column")
    val o = oldDf.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"${c}_old"))
        :+ lit(true).as("_in_old"): _*)
    val n = newDf.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"${c}_new"))
        :+ lit(true).as("_in_new"): _*)
    val changed = compareCols
      .map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(changed, "changed")
          .otherwise("same"))
      .select(keys.map(col)
        ++ compareCols.map(c => coalesce(col(s"${c}_new"), col(s"${c}_old")).as(c))
        :+ col("change_type"): _*)
  }

  /** Apply a changeset (any subset of [[diff]]'s output — it need not
    * contain `same` rows) to a snapshot: keys marked `removed` are
    * deleted, every other change row upserts. One anti-join plus a
    * union — the MERGE INTO shape without a table format. Inverse law,
    * property-tested: `applyChanges(old, diff(old, new)) ≡ new`. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val untouched = snapshot.join(changes.select(keys.map(col): _*),
      keys, "left_anti")
    val upserts = changes.filter(col("change_type") =!= "removed")
      .drop("change_type")
    untouched.unionByName(upserts)
  }
}
