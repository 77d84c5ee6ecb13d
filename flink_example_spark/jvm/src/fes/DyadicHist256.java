package fes;

/** No-arg k=256 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class DyadicHist256 extends DyadicHist {
  public DyadicHist256() {
    super(256);
  }
}
