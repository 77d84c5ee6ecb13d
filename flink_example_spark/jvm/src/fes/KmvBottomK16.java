package fes;

/** No-arg k=16 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class KmvBottomK16 extends KmvBottomK {
  public KmvBottomK16() {
    super(16);
  }
}
