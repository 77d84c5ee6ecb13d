package fes;

/** No-arg k=64 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class DyadicHist64 extends DyadicHist {
  public DyadicHist64() {
    super(64);
  }
}
