package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The ONE experiment arm-assignment rule (the x42 hash-sample
  * discipline): md5 parity of the salted user id — deterministic,
  * cross-engine (DuckDB mirrors it as
  * `CAST(CONCAT('0x', substr(md5('a:' || user_id), 1, 8)) AS UBIGINT) % 2`),
  * and uniform enough for 50/50 designs. Every experiment-family
  * consumer shares THIS definition (x357/x367 SRM guards, x362 CUPED,
  * x374 winsorized readout, x375 QTE, the SrmMaintainStream continuous
  * guard — the x31 no-drift discipline: an assignment-hash change can
  * never desynchronize one reader from the others). Requires a
  * `user_id` column in scope.
  */
object Experiment {
  val ArmExpr: String =
    "CAST(conv(substring(md5(concat('a:', cast(user_id as string))), 1, 8), 16, 10) AS BIGINT) % 2"

  def arm: Column = expr(ArmExpr)
}
