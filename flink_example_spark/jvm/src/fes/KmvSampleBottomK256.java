package fes;

/** No-arg k=256 pin (registerJavaUDAF instantiates via no-arg ctor). */
public class KmvSampleBottomK256 extends KmvSampleBottomK {
  public KmvSampleBottomK256() {
    super(256);
  }
}
