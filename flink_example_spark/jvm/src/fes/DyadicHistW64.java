package fes;

/** No-arg k=64 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class DyadicHistW64 extends DyadicHistW {
  public DyadicHistW64() {
    super(64);
  }
}
