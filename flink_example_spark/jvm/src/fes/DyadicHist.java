package fes;

import java.util.ArrayList;
import java.util.List;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.expressions.MutableAggregationBuffer;
import org.apache.spark.sql.expressions.UserDefinedAggregateFunction;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;

/**
 * Adaptive-resolution dyadic histogram over NON-NEGATIVE longs — the
 * deterministic mergeable quantile sketch (the KLL follow-up noted in
 * PERF.md). State: a resolution level L plus EXACT counts of the at
 * most k live dyadic buckets {v &gt;&gt; L}; when the bucket set
 * outgrows k, L increments (adjacent buckets merge losslessly:
 * b &gt;&gt; 1) until it fits.
 *
 * MERGE-ORDER INVARIANCE (the property true KLL compaction lacks, and
 * the reason this sketch can be oracle-hashed): the bucket set
 * B_L(U) = {v &gt;&gt; L : v in U} is monotone in U and non-increasing
 * in L, so every partial buffer at level L is exactly B_L(U') with
 * exact counts, and the final level is min{L : |B_L(U)| &lt;= k}
 * regardless of row order or merge tree — an intermediate buffer can
 * force L up only if the full union's bucket set at L-1 also exceeds k.
 * The result is a pure function of the input multiset: exact counts at
 * the coarsest-needed resolution, computable in closed form by any SQL
 * engine (GROUP BY v &gt;&gt; L at the argmin level).
 *
 * Rank reads give DETERMINISTIC bounds: a quantile lands in one bucket
 * whose value span is 2^L and whose exact rank interval is the
 * cumulative count — the value-resolution guarantee, complementary to
 * the KMV row sample's probabilistic rank-uniform error.
 *
 * Returns a flat long array [L, b1, c1, b2, c2, ...] with buckets
 * ascending (scalar-friendly to unpack in both engines). Negative
 * inputs THROW (dyadic shifts are floor-division only for v &gt;= 0 —
 * callers offset or guard); NULLs are ignored like COUNT.
 */
public class DyadicHist extends UserDefinedAggregateFunction {
  private final int k;

  public DyadicHist(int k) {
    this.k = k;
  }

  @Override
  public StructType inputSchema() {
    return new StructType(new StructField[] {
      DataTypes.createStructField("v", DataTypes.LongType, true)
    });
  }

  @Override
  public StructType bufferSchema() {
    return new StructType(new StructField[] {
      DataTypes.createStructField("level", DataTypes.IntegerType, false),
      DataTypes.createStructField(
          "bs", DataTypes.createArrayType(DataTypes.LongType, false), false),
      DataTypes.createStructField(
          "cs", DataTypes.createArrayType(DataTypes.LongType, false), false)
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
    buffer.update(0, 0);
    buffer.update(1, new ArrayList<Long>());
    buffer.update(2, new ArrayList<Long>());
  }

  /** Coarsen (bs, cs) from fromLevel to toLevel in place-ish. */
  private static void coarsen(
      ArrayList<Long> bs, ArrayList<Long> cs, int shift) {
    if (shift <= 0 || bs.isEmpty()) return;
    ArrayList<Long> nb = new ArrayList<>(bs.size());
    ArrayList<Long> nc = new ArrayList<>(cs.size());
    for (int i = 0; i < bs.size(); i++) {
      long b = bs.get(i) >> shift;
      int last = nb.size() - 1;
      if (last >= 0 && nb.get(last) == b) {
        nc.set(last, nc.get(last) + cs.get(i));
      } else {
        nb.add(b);
        nc.add(cs.get(i));
      }
    }
    bs.clear();
    bs.addAll(nb);
    cs.clear();
    cs.addAll(nc);
  }

  /** While over capacity, halve resolution. Returns the new level. */
  private int compress(ArrayList<Long> bs, ArrayList<Long> cs, int level) {
    while (bs.size() > k) {
      coarsen(bs, cs, 1);
      level++;
    }
    return level;
  }

  protected void addOne(MutableAggregationBuffer buffer, long v, long c) {
    if (v < 0) {
      throw new IllegalArgumentException(
          "DyadicHist: negative input " + v + " (dyadic shift is floor "
              + "division only for v >= 0 — offset or filter first)");
    }
    int level = buffer.getInt(0);
    ArrayList<Long> bs = new ArrayList<>(buffer.<Long>getList(1));
    ArrayList<Long> cs = new ArrayList<>(buffer.<Long>getList(2));
    long b = v >> level;
    int lo = 0, hi = bs.size();
    while (lo < hi) {
      int mid = (lo + hi) >>> 1;
      if (bs.get(mid) < b) lo = mid + 1;
      else hi = mid;
    }
    if (lo < bs.size() && bs.get(lo) == b) {
      cs.set(lo, cs.get(lo) + c);
    } else {
      bs.add(lo, b);
      cs.add(lo, c);
      level = compress(bs, cs, level);
    }
    buffer.update(0, level);
    buffer.update(1, bs);
    buffer.update(2, cs);
  }

  @Override
  public void update(MutableAggregationBuffer buffer, Row input) {
    if (input.isNullAt(0)) return;
    addOne(buffer, input.getLong(0), 1L);
  }

  @Override
  public void merge(MutableAggregationBuffer buffer, Row other) {
    int oLevel = other.getInt(0);
    List<Long> obs = other.getList(1);
    List<Long> ocs = other.getList(2);
    if (obs.isEmpty()) return;
    int level = buffer.getInt(0);
    ArrayList<Long> bs = new ArrayList<>(buffer.<Long>getList(1));
    ArrayList<Long> cs = new ArrayList<>(buffer.<Long>getList(2));
    ArrayList<Long> mbs = new ArrayList<>(obs);
    ArrayList<Long> mcs = new ArrayList<>(ocs);
    int target = Math.max(level, oLevel);
    coarsen(bs, cs, target - level);
    coarsen(mbs, mcs, target - oLevel);
    // sorted two-pointer merge-add
    ArrayList<Long> nb = new ArrayList<>(bs.size() + mbs.size());
    ArrayList<Long> nc = new ArrayList<>(bs.size() + mbs.size());
    int i = 0, j = 0;
    while (i < bs.size() || j < mbs.size()) {
      if (j >= mbs.size() || (i < bs.size() && bs.get(i) < mbs.get(j))) {
        nb.add(bs.get(i));
        nc.add(cs.get(i));
        i++;
      } else if (i >= bs.size() || mbs.get(j) < bs.get(i)) {
        nb.add(mbs.get(j));
        nc.add(mcs.get(j));
        j++;
      } else {
        nb.add(bs.get(i));
        nc.add(cs.get(i) + mcs.get(j));
        i++;
        j++;
      }
    }
    target = compress(nb, nc, target);
    buffer.update(0, target);
    buffer.update(1, nb);
    buffer.update(2, nc);
  }

  @Override
  public Object evaluate(Row buffer) {
    List<Long> bs = buffer.getList(1);
    List<Long> cs = buffer.getList(2);
    ArrayList<Long> out = new ArrayList<>(1 + 2 * bs.size());
    out.add((long) buffer.getInt(0));
    for (int i = 0; i < bs.size(); i++) {
      out.add(bs.get(i));
      out.add(cs.get(i));
    }
    return out;
  }
}
