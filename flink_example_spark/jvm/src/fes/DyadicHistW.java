package fes;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.expressions.MutableAggregationBuffer;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;

/**
 * WEIGHTED-input dyadic histogram: update takes (value, count) pairs so
 * a whole-stage-codegen pre-aggregation (GROUP BY value) can feed the
 * UDAF with distinct values instead of raw rows — the per-row UDAF
 * update (~15k rows/s/core under the UserDefinedAggregateFunction
 * buffer-copy cost) is the 100 TB bottleneck, and duplicates-heavy
 * columns collapse by orders of magnitude before reaching it. The
 * merged state is IDENTICAL to the row-fed DyadicHist by merge-order
 * invariance (a weighted multiset is the same multiset).
 */
public class DyadicHistW extends DyadicHist {
  public DyadicHistW(int k) {
    super(k);
  }

  @Override
  public StructType inputSchema() {
    return new StructType(new StructField[] {
      DataTypes.createStructField("v", DataTypes.LongType, true),
      DataTypes.createStructField("c", DataTypes.LongType, true)
    });
  }

  @Override
  public void update(MutableAggregationBuffer buffer, Row input) {
    if (input.isNullAt(0) || input.isNullAt(1)) return;
    long c = input.getLong(1);
    if (c <= 0) return;
    addOne(buffer, input.getLong(0), c);
  }
}
