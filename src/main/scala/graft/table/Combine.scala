package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table combination: column-wise append (zip by position) and row-wise
  * concatenation with union-schema merge — the reference's only two
  * multi-table operators (reference
  * org.knime.core.data.columnar/.../table/virtual/ColumnarVirtualTable.java:222-237 append,
  * :344-390 concatenate; ColumnarConcatenater.java:157-184 driver,
  * TablePrepper casts/missing-columns/permutation :294-394;
  * TableTransformUtils.appendTables:83-110 + checkRowKeysMatch:120-143).
  */
object Combine {

  /** Zip two tables of equal row count side-by-side, by position.
    *
    * Distributed strategy: exact row index on both sides (narrow indexing,
    * no shuffle; the size-equality check required by the reference rides
    * on the count-partitions job the indexing needs anyway — two passes
    * per side total, not three) then an equi-join on the index. With AQE
    * the join shuffles both sides once on a perfectly uniform Long key —
    * the scalable analog of the reference's in-process positional zip
    * (appendSize check: reference TableTransformUtils.java:77-81). Name
    * collisions on the right get a "_r" suffix.
    *
    * `sortedOutput = false` skips the final range-sort back into
    * positional order — use it when the caller re-orders at the edge
    * anyway (a full sort shuffle of the joined payload is the single
    * largest cost of this operator at scale).
    */
  def appendByPosition(left: DataFrame, right: DataFrame, sortedOutput: Boolean = true): DataFrame = {
    val idx = "__graft_zip_idx"
    val (l, nl) = RowId.withRowIndexCounted(left, idx)
    val leftNames = left.columns.toSet
    val renamedRight = {
      // suffix until the name is fresh on BOTH sides ("x" next to an
      // existing "x_r" must not produce duplicate "x_r" columns)
      val taken = scala.collection.mutable.Set.empty[String]
      taken ++= right.columns
      right.columns.foldLeft(right) { (d, c) =>
        if (leftNames.contains(c)) {
          var fresh = c + "_r"
          while (leftNames.contains(fresh) || taken.contains(fresh)) fresh += "_r"
          taken += fresh
          d.withColumnRenamed(c, fresh)
        } else d
      }
    }
    val (r, nr) = RowId.withRowIndexCounted(renamedRight, idx)
    require(nl == nr, s"appendByPosition: row counts differ ($nl vs $nr)")
    val joined = l.join(r, Seq(idx))
    (if (sortedOutput) joined.orderBy(col(idx)) else joined).drop(idx)
  }

  /** Decimal wide enough to hold each integral type exactly. */
  private val integralDecimal: PartialFunction[DataType, DecimalType] = {
    case ByteType  => DecimalType(3, 0)
    case ShortType => DecimalType(5, 0)
    case IntegerType => DecimalType(10, 0)
    case LongType  => DecimalType(20, 0)
  }

  /** Least common supertype for concatenation's per-column type merge
    * (reference merge at ColumnarVirtualTable.java:360-390). Uses numeric
    * widening; otherwise requires equal types or falls back to string.
    */
  private[graft] def commonType(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y)    => y
    case (x, NullType)    => x
    case (da: DecimalType, db: DecimalType) =>
      // widen to cover both ranges: max integral digits + max scale
      val scale = math.max(da.scale, db.scale)
      val integral = math.max(da.precision - da.scale, db.precision - db.scale)
      DecimalType(math.min(integral + scale, DecimalType.MAX_PRECISION), scale)
    case (d: DecimalType, i) if integralDecimal.isDefinedAt(i) => commonType(d, integralDecimal(i))
    case (i, d: DecimalType) if integralDecimal.isDefinedAt(i) => commonType(integralDecimal(i), d)
    case (x: NumericType, y: NumericType) =>
      val order: Seq[DataType] =
        Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
      val (ia, ib) = (order.indexOf(x), order.indexOf(y))
      if (ia >= 0 && ib >= 0) order(math.max(ia, ib)) else DoubleType
    case (ArrayType(ea, na), ArrayType(eb, nb)) => ArrayType(commonType(ea, eb), na || nb)
    case (MapType(ka, va, na), MapType(kb, vb, nb)) =>
      MapType(commonType(ka, kb), commonType(va, vb), na || nb)
    case (sa: StructType, sb: StructType) =>
      // recursive union-by-name: first struct's field order, then fields
      // new in the second; a field missing on either side becomes nullable
      val bByName = sb.fields.map(f => f.name -> f).toMap
      val aNames = sa.fieldNames.toSet
      val merged =
        sa.fields.map { fa =>
          bByName.get(fa.name) match {
            case Some(fb) => StructField(fa.name, commonType(fa.dataType, fb.dataType), fa.nullable || fb.nullable)
            case None     => fa.copy(nullable = true)
          }
        } ++ sb.fields.filterNot(f => aNames.contains(f.name)).map(_.copy(nullable = true))
      StructType(merged)
    case _ => StringType
  }

  /** Rebuild a column of type `from` as type `to` (the merged supertype):
    * plain `cast` cannot widen STRUCTS with differing field sets, so
    * struct columns are reconstructed field-by-field (missing fields →
    * typed nulls, shared fields aligned recursively), arrays align their
    * elements, and everything else casts.
    */
  private def align(c: Column, from: DataType, to: DataType): Column = (from, to) match {
    case (f, t) if f == t => c
    case (fs: StructType, ts: StructType) =>
      val byName = fs.fields.map(f => f.name -> f).toMap
      val rebuilt = struct(ts.fields.toSeq.map { tf =>
        byName.get(tf.name) match {
          case Some(ff) => align(c.getField(tf.name), ff.dataType, tf.dataType).as(tf.name)
          case None     => lit(null).cast(tf.dataType).as(tf.name)
        }
      }: _*)
      // struct() of a null input would yield a struct of nulls, not null
      when(c.isNull, lit(null).cast(ts)).otherwise(rebuilt)
    case (ArrayType(fe, _), ArrayType(te, _)) if fe != te =>
      transform(c, e => align(e, fe, te))
    case (MapType(fk, fv, _), MapType(tk, tv, _)) if fk != tk || fv != tv =>
      // plain cast rejects maps whose value structs differ in field sets —
      // rebuild via the key/value transforms (null maps propagate as null)
      transform_values(
        transform_keys(c, (k, _) => align(k, fk, tk)),
        (_, v) => align(v, fv, tv))
    case (_, t) => c.cast(t)
  }

  /** Union-by-name with full schema reconciliation: per-column common
    * supertype upcast, missing columns inserted as typed nulls, column order
    * = first table's order followed by columns new in later tables (the
    * reference's union-schema permutation, ColumnarConcatenater.java:217-235).
    * Shuffle-free (Union is narrow); at 100 TB this is the operator of
    * choice for appending partitions of a dataset.
    */
  def concatenate(tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty)
    // Union schema: first-table order, then new columns in appearance order.
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    tables.foreach(_.schema.fields.foreach { f =>
      fields(f.name) = fields.get(f.name).map(commonType(_, f.dataType)).getOrElse(f.dataType)
    })
    val ordered = fields.toSeq
    val aligned = tables.map { t =>
      val have = t.schema.fields.map(f => f.name -> f.dataType).toMap
      t.select(ordered.map { case (n, dt) =>
        have.get(n) match {
          case Some(`dt`) => col(n)
          case Some(ft)   => align(col(n), ft, dt).as(n)
          case None       => lit(null).cast(dt).as(n)
        }
      }: _*)
    }
    aligned.reduce(_.unionAll(_))
  }

  /** Concatenate + regenerate RowIDs "Row0","Row1",… (reference
    * concatenateWithNewRowIDs, ColumnarTableBackend.java:206-215).
    */
  def concatenateWithNewRowIds(tables: Seq[DataFrame]): DataFrame =
    RowId.regenerateRowIds(concatenate(tables))

  /** Concatenate with RowID duplicate-suffix uniquification (reference
    * RowIDUniquifier, ColumnarConcatenater.java:237-292).
    */
  def concatenateUniquifyRowIds(tables: Seq[DataFrame]): DataFrame =
    RowId.uniquifyRowIds(concatenate(tables.map(RowId.ensureRowId)))
}
