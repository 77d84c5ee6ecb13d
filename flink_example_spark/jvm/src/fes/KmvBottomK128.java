package fes;

/** No-arg k=128 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class KmvBottomK128 extends KmvBottomK {
  public KmvBottomK128() {
    super(128);
  }
}
