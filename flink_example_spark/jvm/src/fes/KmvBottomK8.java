package fes;

/** No-arg k=8 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class KmvBottomK8 extends KmvBottomK {
  public KmvBottomK8() {
    super(8);
  }
}
