package fes;

/** No-arg k=32 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class KmvBottomK32 extends KmvBottomK {
  public KmvBottomK32() {
    super(32);
  }
}
