package graft.pipeline

import org.apache.spark.sql.DataFrame

import graft.core.Catalog

/** The reference's Dataproc transform job (SURVEY §2.1 S1/S2,
  * `scripts/transform_script:5-35`): read `namespace.table`, apply a
  * transform (identity in the reference — the interesting semantics are the
  * failure path), overwrite-write with schema evolution.
  *
  * CLI parity: `--input_table` / `--output_table` map to the `inputRef` /
  * `outputRef` strings; the catalog raises the reference's seeded failure
  * class (`selfhealing..table`, `transform_script:13`) as a typed
  * [[graft.core.BadTableRef]] the [[SelfHealingRunner]] can classify+patch.
  */
final class TransformJob(
    catalog: Catalog,
    transform: DataFrame => DataFrame = identity,
    partitionBy: Seq[String] = Nil) {

  def run(inputRef: String, outputRef: String): Long = {
    val in = catalog.load(inputRef)
    val out = transform(in)
    catalog.save(out, outputRef, partitionBy)
    catalog.load(outputRef).count()
  }

  /** The healing-wrapped form: the input reference is the healable artifact
    * (the reference patches the script containing it; the observable
    * contract — bad ref in, patched artifact out, rerun succeeds — is
    * identical). */
  def runHealed(inputRef: String, outputRef: String, maxAttempts: Int = 3)
      : (Long, Seq[HealingAttempt]) =
    new SelfHealingRunner(maxAttempts).run(inputRef)(ref => run(ref, outputRef))
}
