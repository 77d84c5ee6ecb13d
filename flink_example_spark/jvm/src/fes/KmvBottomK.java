package fes;

import java.util.ArrayList;
import java.util.Collections;
import java.util.List;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.expressions.MutableAggregationBuffer;
import org.apache.spark.sql.expressions.UserDefinedAggregateFunction;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;

/**
 * Bottom-k DISTINCT long hashes as a true bounded-state JVM aggregate —
 * the KMV sketch's merge monoid with O(k) buffer, PARTIAL-AGGREGATED on
 * the map side (the plan shows partial_kmv_bottomk below the exchange,
 * so only partitions x k hashes per group ever shuffle). This is the
 * capability a Python grouped-agg pandas UDF cannot provide (it ships
 * whole groups to the worker); see PERF.md "missing: JVM merge
 * aggregates" (closed round 12).
 *
 * State: a sorted ascending java List&lt;Long&gt; of at most k distinct
 * hashes. update() inserts by binary search; merge() folds the other
 * partial's list in. Bottom-k over a multiset equals bottom-k over the
 * set, and the merge is commutative/associative/idempotent, so any
 * partial-aggregation schedule yields the identical final array.
 *
 * The deprecated UserDefinedAggregateFunction API is used deliberately:
 * it is the one JVM aggregate registrable into a RUNNING session from
 * PySpark (ADD JAR + spark.udf.registerJavaUDAF) with no Scala build
 * chain; Spark 4.1 still ships and plans it (SortAggregate with
 * partial_/merge_ modes). Subclasses pin k because registerJavaUDAF
 * instantiates via the no-arg constructor.
 */
public class KmvBottomK extends UserDefinedAggregateFunction {
  private final int k;

  public KmvBottomK(int k) {
    this.k = k;
  }

  @Override
  public StructType inputSchema() {
    return new StructType(new StructField[] {
      DataTypes.createStructField("h", DataTypes.LongType, true)
    });
  }

  @Override
  public StructType bufferSchema() {
    return new StructType(new StructField[] {
      DataTypes.createStructField(
          "ks", DataTypes.createArrayType(DataTypes.LongType, false), false)
    });
  }

  @Override
  public DataType dataType() {
    return DataTypes.createArrayType(DataTypes.LongType, false);
  }

  @Override
  public boolean deterministic() {
    return true;
  }

  @Override
  public void initialize(MutableAggregationBuffer buffer) {
    buffer.update(0, new ArrayList<Long>());
  }

  /** Sorted-distinct capped insert; null when the buffer is unchanged. */
  private List<Long> insert(List<Long> cur, long h) {
    int pos = Collections.binarySearch(cur, h);
    if (pos >= 0) return null; // already present
    int ins = -pos - 1;
    if (cur.size() >= k && ins >= k) return null; // full and h > max
    ArrayList<Long> next = new ArrayList<>(cur);
    next.add(ins, h);
    if (next.size() > k) next.remove(next.size() - 1);
    return next;
  }

  @Override
  public void update(MutableAggregationBuffer buffer, Row input) {
    if (input.isNullAt(0)) return;
    List<Long> next = insert(buffer.getList(0), input.getLong(0));
    if (next != null) buffer.update(0, next);
  }

  @Override
  public void merge(MutableAggregationBuffer buffer, Row other) {
    List<Long> cur = buffer.getList(0);
    boolean changed = false;
    for (Object o : other.getList(0)) {
      List<Long> next = insert(cur, (Long) o);
      if (next != null) {
        cur = next;
        changed = true;
      }
    }
    if (changed) buffer.update(0, cur);
  }

  @Override
  public Object evaluate(Row buffer) {
    return buffer.getList(0);
  }
}
