package fes;

/** No-arg k=64 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class KmvSampleBottomK64 extends KmvSampleBottomK {
  public KmvSampleBottomK64() {
    super(64);
  }
}
