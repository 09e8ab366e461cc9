package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from built-ins (preference (a) of the custom-operator ladder).
  *
  * For each left row, attach the most recent right row with the same key and
  * `rightTime <= leftTime`. Implemented as the union-LOCF plan, NOT a
  * pair-generating range join:
  *
  *   1. tag and union both sides on a common schema, right payload packed
  *      into ONE struct column (atomic — no cross-row column mixing when a
  *      payload field is null);
  *   2. one window over (key ORDER BY time, side, tie) carrying the struct
  *      forward with `last(_, ignoreNulls = true)`;
  *   3. keep left rows, unpack the struct.
  *
  * Cost: ONE shuffle on the key, sort within partitions — linear in
  * |left| + |right|, no (left × matching-right) intermediate, which is what
  * makes this the 100 TB shape (an equi+range join then rn=1 would generate
  * every historical pair per left row before discarding all but one).
  *
  * Right rows tie-broken by `rightTime` then `tieCol` (last wins); a right
  * row at exactly `leftTime` IS visible to that left row (inclusive as-of,
  * right side sorts before left at equal timestamps).
  */
object AsOf {

  /** @param left      left (probe) rows
    * @param right     right (reference) rows
    * @param key       equi-join key column name (same on both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param tieCol    right column breaking equal-timestamp ties (last wins)
    * @param payload   right columns to attach as `asof_<name>` (null when no
    *                  match exists yet)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      tieCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    val taggedRight = right.select(
      col(key), col(rightTime).as("__t"), lit(0).as("__side"),
      col(tieCol).cast("long").as("__tie"), payloadStruct.as("__r"))
    val rightStructType = taggedRight.schema("__r").dataType
    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__r", lit(null).cast(rightStructType))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal time → inclusive
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
