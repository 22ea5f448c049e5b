package ai.onnxruntime;

/**
 * TEST DOUBLE of the public onnxruntime Java API surface (the
 * {@code ai.onnxruntime} package of com.microsoft.onnxruntime:onnxruntime,
 * public javadoc at onnxruntime.ai) — test scope only, never shipped.
 *
 * <p>Purpose: {@code graft.encode.OnnxEmbedder} binds the runtime
 * REFLECTIVELY as an optional dependency. These classes implement the
 * exact class/method/signature surface that reflection spells
 * ({@code OrtEnvironment.getEnvironment()},
 * {@code createSession(String, OrtSession.SessionOptions)},
 * {@code OrtSession.run(Map)}, {@code Result.get(int)},
 * {@code OnnxTensor.createTensor(OrtEnvironment, LongBuffer, long[])},
 * {@code OnnxValue.getValue()}) backed by a genuine — if tiny — ONNX
 * protobuf interpreter ({@link TinyOnnxInterp}), so the reflective wiring
 * executes end-to-end in CI against a real committed model file instead
 * of only failing at a user's site on a typo'd method name or a wrong
 * tensor shape.
 */
public interface OnnxValue extends AutoCloseable {
  /** Tensor contents as nested Java arrays (e.g. {@code float[1][n][dim]}). */
  Object getValue();

  @Override
  void close();
}
