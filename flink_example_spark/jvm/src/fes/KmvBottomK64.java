package fes;

/** No-arg k=64 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class KmvBottomK64 extends KmvBottomK {
  public KmvBottomK64() {
    super(64);
  }
}
