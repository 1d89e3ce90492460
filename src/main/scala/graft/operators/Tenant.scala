package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.EmFunctions

/** Multi-tenant row filtering + field masking combinators — the
  * reference's WHERE-injection row scoping (tenant_resources.py:317-338)
  * and gated field masking (macros/federal_compliance.sql:15-25) as
  * composable DataFrame transforms. Pure Column predicates, so pushdown
  * and partition pruning still apply under the tenant scope.
  */
object Tenant {

  final case class Scope(tenantId: String, allowedClassifications: Seq[String], maskedColumns: Seq[String])

  /** Row scope: tenant's own rows (or unowned/public rows) at permitted
    * classification levels. */
  def rowFilter(scope: Scope, tenantCol: String = "tenant_id"): Column =
    (col(tenantCol) === scope.tenantId || col(tenantCol).isNull) &&
      col("data_classification").isin(scope.allowedClassifications: _*)

  /** Apply scope: filter rows, mask configured columns. */
  def apply(df: DataFrame, scope: Scope, tenantCol: String = "tenant_id"): DataFrame = {
    val filtered = df.filter(rowFilter(scope, tenantCol))
    scope.maskedColumns.foldLeft(filtered) { (d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, EmFunctions.maskSensitive(col(c))) else d
    }
  }
}
