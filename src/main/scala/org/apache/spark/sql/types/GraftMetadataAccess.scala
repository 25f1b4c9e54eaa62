package org.apache.spark.sql.types

/** Visibility bridge for [[Metadata]]'s backing map (scoped
  * `private[types]`) — see [[org.apache.spark.sql.GraftSqlInternals]]
  * for why enumeration is needed.
  */
private[sql] object GraftMetadataAccess {
  def map(m: Metadata): Map[String, Any] = m.map
}
