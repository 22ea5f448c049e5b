package ai.onnxruntime;

import java.lang.reflect.Array;
import java.nio.LongBuffer;
import java.util.concurrent.atomic.AtomicInteger;

/**
 * Test double of the onnxruntime {@code OnnxTensor} (see {@link OnnxValue}
 * for why this package exists in test scope). Tracks live (created but not
 * yet closed) tensors so specs can assert the embedder's try/finally
 * discipline leaks nothing.
 */
public final class OnnxTensor implements OnnxValue {

  /** Created-minus-closed tensor count across the JVM (inputs AND outputs). */
  public static final AtomicInteger LIVE = new AtomicInteger();

  final long[] longData;   // int64 tensors (model inputs)
  final float[] floatData; // float tensors (model outputs)
  final long[] shape;
  private boolean closed;

  private OnnxTensor(long[] longData, float[] floatData, long[] shape) {
    this.longData = longData;
    this.floatData = floatData;
    this.shape = shape;
    LIVE.incrementAndGet();
  }

  /** The exact factory signature OnnxEmbedder resolves reflectively. */
  public static OnnxTensor createTensor(OrtEnvironment env, LongBuffer data, long[] shape) {
    long[] arr = new long[data.remaining()];
    data.duplicate().get(arr);
    long n = 1;
    for (long d : shape) n *= d;
    if (n != arr.length) {
      throw new IllegalArgumentException(
          "shape " + java.util.Arrays.toString(shape) + " does not cover " + arr.length + " values");
    }
    return new OnnxTensor(arr, null, shape.clone());
  }

  static OnnxTensor fromFloats(float[] data, long[] shape) {
    return new OnnxTensor(null, data, shape.clone());
  }

  /** Contents as nested arrays by shape — float[1][n][dim] for rank-3 float. */
  @Override
  public Object getValue() {
    int[] dims = new int[shape.length];
    for (int i = 0; i < shape.length; i++) dims[i] = (int) shape[i];
    Class<?> elem = floatData != null ? float.class : long.class;
    Object out = Array.newInstance(elem, dims);
    fill(out, dims, 0, new int[]{0});
    return out;
  }

  private void fill(Object arr, int[] dims, int level, int[] cursor) {
    if (level == dims.length - 1) {
      for (int i = 0; i < dims[level]; i++) {
        if (floatData != null) Array.setFloat(arr, i, floatData[cursor[0]++]);
        else Array.setLong(arr, i, longData[cursor[0]++]);
      }
    } else {
      for (int i = 0; i < dims[level]; i++) {
        fill(Array.get(arr, i), dims, level + 1, cursor);
      }
    }
  }

  @Override
  public void close() {
    if (!closed) {
      closed = true;
      LIVE.decrementAndGet();
    }
  }
}
