package fes;

import java.nio.charset.StandardCharsets;
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
 * Bottom-k rows by (hash, key) carrying a value payload — the
 * deterministic uniform-sample monoid behind kmv_quantile_sample /
 * kmv_quantiles, as a TRUE bounded-state JVM aggregate (O(k) buffer,
 * map-side partial merge; the t-digest-style "mergeable quantile
 * state" on-ramp noted in PERF.md). Returns the sample's VALUES
 * ordered by (hash, key).
 *
 * Ordering matches Spark SQL exactly: longs ascending, key ties broken
 * by UNSIGNED UTF-8 BYTE comparison (Spark's binary string order —
 * Java String.compareTo would diverge on supplementary characters).
 * Duplicate (hash, key) pairs are kept as a multiset, like the
 * row_number window form; with duplicate keys carrying DIFFERENT
 * values both forms are order-arbitrary among the duplicates, so the
 * operator's determinism contract requires a unique key column (same
 * contract as the window form).
 */
public class KmvSampleBottomK extends UserDefinedAggregateFunction {
  private final int k;

  public KmvSampleBottomK(int k) {
    this.k = k;
  }

  @Override
  public StructType inputSchema() {
    return new StructType(new StructField[] {
      DataTypes.createStructField("h", DataTypes.LongType, true),
      DataTypes.createStructField("k", DataTypes.StringType, true),
      DataTypes.createStructField("v", DataTypes.DoubleType, true)
    });
  }

  @Override
  public StructType bufferSchema() {
    return new StructType(new StructField[] {
      DataTypes.createStructField(
          "hs", DataTypes.createArrayType(DataTypes.LongType, false), false),
      DataTypes.createStructField(
          "ks", DataTypes.createArrayType(DataTypes.StringType, false), false),
      DataTypes.createStructField(
          "vs", DataTypes.createArrayType(DataTypes.DoubleType, true), false)
    });
  }

  @Override
  public DataType dataType() {
    return DataTypes.createArrayType(DataTypes.DoubleType, true);
  }

  @Override
  public boolean deterministic() {
    return true;
  }

  @Override
  public void initialize(MutableAggregationBuffer buffer) {
    buffer.update(0, new ArrayList<Long>());
    buffer.update(1, new ArrayList<String>());
    buffer.update(2, new ArrayList<Double>());
  }

  private static int cmpUtf8(String a, String b) {
    byte[] ba = a.getBytes(StandardCharsets.UTF_8);
    byte[] bb = b.getBytes(StandardCharsets.UTF_8);
    int n = Math.min(ba.length, bb.length);
    for (int i = 0; i < n; i++) {
      int d = (ba[i] & 0xff) - (bb[i] & 0xff);
      if (d != 0) return d;
    }
    return ba.length - bb.length;
  }

  /** Insertion index: after all entries <= (h, key) — stable multiset. */
  private static int findPos(List<Long> hs, List<String> ks, long h, String key) {
    int lo = 0, hi = hs.size();
    while (lo < hi) {
      int mid = (lo + hi) >>> 1;
      long mh = hs.get(mid);
      int c = (mh < h) ? -1 : (mh > h) ? 1 : cmpUtf8(ks.get(mid), key);
      if (c <= 0) lo = mid + 1;
      else hi = mid;
    }
    return lo;
  }

  private void insert(MutableAggregationBuffer buffer, long h, String key, Double v) {
    List<Long> hs = buffer.getList(0);
    int pos = findPos(hs, buffer.getList(1), h, key);
    if (hs.size() >= k && pos >= k) return; // full and past the cutoff
    ArrayList<Long> nh = new ArrayList<>(hs);
    ArrayList<String> nk = new ArrayList<>(buffer.getList(1));
    ArrayList<Double> nv = new ArrayList<>(buffer.getList(2));
    nh.add(pos, h);
    nk.add(pos, key);
    nv.add(pos, v);
    if (nh.size() > k) {
      int last = nh.size() - 1;
      nh.remove(last);
      nk.remove(last);
      nv.remove(last);
    }
    buffer.update(0, nh);
    buffer.update(1, nk);
    buffer.update(2, nv);
  }

  @Override
  public void update(MutableAggregationBuffer buffer, Row input) {
    if (input.isNullAt(0) || input.isNullAt(1)) return;
    insert(
        buffer,
        input.getLong(0),
        input.getString(1),
        input.isNullAt(2) ? null : (Double) input.getDouble(2));
  }

  @Override
  public void merge(MutableAggregationBuffer buffer, Row other) {
    List<Long> hs = other.getList(0);
    List<String> ks = other.getList(1);
    List<Double> vs = other.getList(2);
    for (int i = 0; i < hs.size(); i++) {
      insert(buffer, hs.get(i), ks.get(i), vs.get(i));
    }
  }

  @Override
  public Object evaluate(Row buffer) {
    return buffer.getList(2);
  }
}
