package fes;

/** No-arg k=32 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class MGTopK32 extends MGTopK {
  public MGTopK32() {
    super(32);
  }
}
