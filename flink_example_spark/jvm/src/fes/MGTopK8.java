package fes;

/** No-arg k=8 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class MGTopK8 extends MGTopK {
  public MGTopK8() {
    super(8);
  }
}
