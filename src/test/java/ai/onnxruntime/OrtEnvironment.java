package ai.onnxruntime;

import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.Paths;

/**
 * Test double of the onnxruntime {@code OrtEnvironment} (see
 * {@link OnnxValue} for why this package exists in test scope).
 * Process-wide singleton, like the real binding.
 */
public final class OrtEnvironment {

  private static final OrtEnvironment INSTANCE = new OrtEnvironment();

  private OrtEnvironment() {}

  public static OrtEnvironment getEnvironment() {
    return INSTANCE;
  }

  /**
   * Parses the ONNX protobuf at {@code modelPath} eagerly — a malformed
   * model fails here, like the real runtime's session construction.
   */
  public OrtSession createSession(String modelPath, OrtSession.SessionOptions options)
      throws IOException {
    byte[] bytes = Files.readAllBytes(Paths.get(modelPath));
    return new OrtSession(TinyOnnxInterp.parse(bytes));
  }
}
