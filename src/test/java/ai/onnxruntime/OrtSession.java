package ai.onnxruntime;

import java.util.ArrayList;
import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;

/**
 * Test double of the onnxruntime {@code OrtSession} (see {@link OnnxValue}
 * for why this package exists in test scope): holds a parsed model and
 * evaluates it with {@link TinyOnnxInterp} on each {@code run}.
 */
public final class OrtSession implements AutoCloseable {

  /** Nested exactly as the real API ({@code OrtSession$SessionOptions}),
   * because OnnxEmbedder resolves it by that binary name. */
  public static final class SessionOptions {
    public SessionOptions() {}
  }

  /** Run output: values in graph-output order; closing the result closes
   * its tensors, like the real binding. */
  public static final class Result implements AutoCloseable {
    private final List<OnnxValue> values;

    Result(List<OnnxValue> values) {
      this.values = values;
    }

    /** The exact accessor signature OnnxEmbedder resolves reflectively. */
    public OnnxValue get(int index) {
      return values.get(index);
    }

    @Override
    public void close() {
      for (OnnxValue v : values) v.close();
    }
  }

  private final TinyOnnxInterp.Model model;

  OrtSession(TinyOnnxInterp.Model model) {
    this.model = model;
  }

  /** The exact run signature OnnxEmbedder resolves reflectively
   * ({@code getMethod("run", Map.class)}). */
  public Result run(Map<String, ? extends OnnxValue> inputs) {
    Map<String, OnnxTensor> feeds = new LinkedHashMap<>();
    for (Map.Entry<String, ? extends OnnxValue> e : inputs.entrySet()) {
      feeds.put(e.getKey(), (OnnxTensor) e.getValue());
    }
    List<OnnxValue> out = new ArrayList<>(TinyOnnxInterp.execute(model, feeds));
    return new Result(out);
  }

  @Override
  public void close() {}
}
