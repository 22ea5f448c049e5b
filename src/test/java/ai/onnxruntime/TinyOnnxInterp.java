package ai.onnxruntime;

import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.util.ArrayList;
import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;

/**
 * A genuinely-parsing, genuinely-executing interpreter for TINY ONNX
 * models, written against the public onnx.proto3 schema and ONNX operator
 * specs (onnx.ai/onnx/operators) — the engine behind the test-scope
 * {@code ai.onnxruntime} API double (see {@link OnnxValue}). Supports
 * exactly what the committed test model (tools/make_tiny_onnx.py) needs —
 * Cast(to=FLOAT), Reshape (shape as input, -1 inference), MatMul
 * (batched A × rank-2 B), Tanh — and FAILS LOUDLY on anything else, so a
 * green spec proves real protobuf bytes flowed through a real forward
 * pass, not that a stub returned canned values.
 */
final class TinyOnnxInterp {

  private TinyOnnxInterp() {}

  // ---- model structures ------------------------------------------------

  static final class Tensor {
    int dtype; // 1 = FLOAT, 7 = INT64 (onnx TensorProto.DataType)
    String name = "";
    long[] shape;
    float[] f;
    long[] l;

    static Tensor floats(float[] data, long[] shape) {
      Tensor t = new Tensor();
      t.dtype = 1; t.f = data; t.shape = shape;
      return t;
    }

    static Tensor longs(long[] data, long[] shape) {
      Tensor t = new Tensor();
      t.dtype = 7; t.l = data; t.shape = shape;
      return t;
    }

    long elems() {
      long n = 1;
      for (long d : shape) n *= d;
      return n;
    }
  }

  static final class Node {
    String op = "";
    String name = "";
    final List<String> inputs = new ArrayList<>();
    final List<String> outputs = new ArrayList<>();
    final Map<String, Long> intAttrs = new LinkedHashMap<>();
  }

  static final class Model {
    final List<Node> nodes = new ArrayList<>();
    final Map<String, Tensor> initializers = new LinkedHashMap<>();
    final List<String> inputNames = new ArrayList<>();
    final List<String> outputNames = new ArrayList<>();
  }

  // ---- protobuf wire parsing ------------------------------------------

  private static final class Reader {
    final byte[] b;
    int pos;
    final int end;

    Reader(byte[] b, int pos, int end) {
      this.b = b; this.pos = pos; this.end = end;
    }

    boolean hasMore() { return pos < end; }

    long varint() {
      long v = 0;
      int shift = 0;
      while (true) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint at " + pos);
        byte x = b[pos++];
        v |= (long) (x & 0x7F) << shift;
        if ((x & 0x80) == 0) return v;
        shift += 7;
        if (shift > 63) throw new IllegalArgumentException("varint too long at " + pos);
      }
    }

    /** Returns field number, leaves wire type in lastWire. */
    int lastWire;

    int tag() {
      long t = varint();
      lastWire = (int) (t & 7);
      return (int) (t >>> 3);
    }

    Reader message() { // wire type 2 payload as a sub-reader
      int len = (int) varint();
      if (pos + len > end) throw new IllegalArgumentException("truncated message at " + pos);
      Reader r = new Reader(b, pos, pos + len);
      pos += len;
      return r;
    }

    String string() {
      Reader r = message();
      return new String(b, r.pos, r.end - r.pos, java.nio.charset.StandardCharsets.UTF_8);
    }

    byte[] bytes() {
      Reader r = message();
      return java.util.Arrays.copyOfRange(b, r.pos, r.end);
    }

    void skip() {
      switch (lastWire) {
        case 0: varint(); break;
        case 1: pos += 8; break;
        case 2: message(); break;
        case 5: pos += 4; break;
        default: throw new IllegalArgumentException("unsupported wire type " + lastWire);
      }
    }
  }

  static Model parse(byte[] bytes) {
    Model m = new Model();
    Reader model = new Reader(bytes, 0, bytes.length);
    boolean sawGraph = false;
    while (model.hasMore()) {
      int field = model.tag();
      if (field == 7) { // ModelProto.graph
        parseGraph(model.message(), m);
        sawGraph = true;
      } else {
        model.skip();
      }
    }
    if (!sawGraph) throw new IllegalArgumentException("not an ONNX ModelProto: no graph");
    return m;
  }

  private static void parseGraph(Reader g, Model m) {
    while (g.hasMore()) {
      int field = g.tag();
      switch (field) {
        case 1: m.nodes.add(parseNode(g.message())); break;
        case 5: {
          Tensor t = parseTensor(g.message());
          m.initializers.put(t.name, t);
          break;
        }
        case 11: m.inputNames.add(valueInfoName(g.message())); break;
        case 12: m.outputNames.add(valueInfoName(g.message())); break;
        default: g.skip();
      }
    }
  }

  private static Node parseNode(Reader n) {
    Node node = new Node();
    while (n.hasMore()) {
      int field = n.tag();
      switch (field) {
        case 1: node.inputs.add(n.string()); break;
        case 2: node.outputs.add(n.string()); break;
        case 3: node.name = n.string(); break;
        case 4: node.op = n.string(); break;
        case 5: parseAttribute(n.message(), node); break;
        default: n.skip();
      }
    }
    return node;
  }

  private static void parseAttribute(Reader a, Node node) {
    String name = "";
    Long intVal = null;
    while (a.hasMore()) {
      int field = a.tag();
      switch (field) {
        case 1: name = a.string(); break;
        case 3: intVal = a.varint(); break;
        default: a.skip();
      }
    }
    if (intVal != null) node.intAttrs.put(name, intVal);
  }

  private static Tensor parseTensor(Reader t) {
    List<Long> dims = new ArrayList<>();
    int dtype = 0;
    byte[] raw = null;
    String name = "";
    while (t.hasMore()) {
      int field = t.tag();
      switch (field) {
        case 1:
          if (t.lastWire == 0) dims.add(t.varint());
          else { // packed
            Reader p = t.message();
            while (p.hasMore()) dims.add(p.varint());
          }
          break;
        case 2: dtype = (int) t.varint(); break;
        case 8: name = t.string(); break;
        case 9: raw = t.bytes(); break;
        default: t.skip();
      }
    }
    long[] shape = new long[dims.size()];
    long n = 1;
    for (int i = 0; i < shape.length; i++) { shape[i] = dims.get(i); n *= shape[i]; }
    if (raw == null) throw new IllegalArgumentException("initializer " + name + " has no raw_data");
    ByteBuffer bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN);
    Tensor out;
    if (dtype == 1) {
      if (raw.length != n * 4) throw new IllegalArgumentException("float initializer " + name + " size mismatch");
      float[] f = new float[(int) n];
      for (int i = 0; i < f.length; i++) f[i] = bb.getFloat();
      out = Tensor.floats(f, shape);
    } else if (dtype == 7) {
      if (raw.length != n * 8) throw new IllegalArgumentException("int64 initializer " + name + " size mismatch");
      long[] l = new long[(int) n];
      for (int i = 0; i < l.length; i++) l[i] = bb.getLong();
      out = Tensor.longs(l, shape);
    } else {
      throw new IllegalArgumentException("unsupported initializer dtype " + dtype + " for " + name);
    }
    out.name = name;
    return out;
  }

  private static String valueInfoName(Reader v) {
    String name = "";
    while (v.hasMore()) {
      int field = v.tag();
      if (field == 1) name = v.string();
      else v.skip();
    }
    return name;
  }

  // ---- execution -------------------------------------------------------

  /** Evaluates the graph on the feeds; returns tensors in graph-output
   * order wrapped for the API double. */
  static List<OnnxTensor> execute(Model m, Map<String, OnnxTensor> feeds) {
    Map<String, Tensor> env = new LinkedHashMap<>(m.initializers);
    for (String in : m.inputNames) {
      if (m.initializers.containsKey(in)) continue;
      OnnxTensor fed = feeds.get(in);
      if (fed == null) throw new IllegalArgumentException("missing input: " + in
          + " (fed: " + feeds.keySet() + ")");
      if (fed.longData == null) throw new IllegalArgumentException("input " + in + " must be int64");
      env.put(in, Tensor.longs(fed.longData, fed.shape));
    }
    for (Node n : m.nodes) {
      env.put(n.outputs.get(0), eval(n, env));
    }
    List<OnnxTensor> out = new ArrayList<>();
    for (String name : m.outputNames) {
      Tensor t = env.get(name);
      if (t == null) throw new IllegalStateException("graph output " + name + " never produced");
      if (t.dtype != 1) throw new IllegalStateException("output " + name + " is not float");
      out.add(OnnxTensor.fromFloats(t.f, t.shape));
    }
    return out;
  }

  private static Tensor in(Node n, Map<String, Tensor> env, int i) {
    Tensor t = env.get(n.inputs.get(i));
    if (t == null) throw new IllegalStateException(n.op + " input " + n.inputs.get(i) + " unavailable");
    return t;
  }

  private static Tensor eval(Node n, Map<String, Tensor> env) {
    switch (n.op) {
      case "Cast": {
        Tensor a = in(n, env, 0);
        long to = n.intAttrs.getOrDefault("to", -1L);
        if (to != 1 || a.dtype != 7) {
          throw new IllegalArgumentException("Cast supports int64->float only (to=" + to + ")");
        }
        float[] f = new float[(int) a.elems()];
        for (int i = 0; i < f.length; i++) f[i] = (float) a.l[i];
        return Tensor.floats(f, a.shape.clone());
      }
      case "Reshape": {
        Tensor a = in(n, env, 0);
        Tensor s = in(n, env, 1);
        if (s.dtype != 7) throw new IllegalArgumentException("Reshape shape must be int64");
        long[] shape = s.l.clone();
        long known = 1;
        int inferAt = -1;
        for (int i = 0; i < shape.length; i++) {
          if (shape[i] == -1) {
            if (inferAt >= 0) throw new IllegalArgumentException("Reshape: two -1 dims");
            inferAt = i;
          } else if (shape[i] <= 0) {
            throw new IllegalArgumentException("Reshape: unsupported dim " + shape[i]);
          } else {
            known *= shape[i];
          }
        }
        long total = a.elems();
        if (inferAt >= 0) shape[inferAt] = total / known;
        long check = 1;
        for (long d : shape) check *= d;
        if (check != total) throw new IllegalArgumentException("Reshape: element count mismatch");
        Tensor out = new Tensor();
        out.dtype = a.dtype; out.f = a.f; out.l = a.l; out.shape = shape;
        return out;
      }
      case "MatMul": {
        Tensor a = in(n, env, 0);
        Tensor b = in(n, env, 1);
        if (a.dtype != 1 || b.dtype != 1) throw new IllegalArgumentException("MatMul needs float inputs");
        if (a.shape.length < 2 || b.shape.length != 2) {
          throw new IllegalArgumentException("MatMul supports [batch..., M, K] x [K, N] only");
        }
        int rank = a.shape.length;
        int mDim = (int) a.shape[rank - 2];
        int kDim = (int) a.shape[rank - 1];
        if (b.shape[0] != kDim) throw new IllegalArgumentException("MatMul: K mismatch");
        int nDim = (int) b.shape[1];
        long batch = 1;
        for (int i = 0; i < rank - 2; i++) batch *= a.shape[i];
        float[] out = new float[(int) (batch * mDim * nDim)];
        for (int bi = 0; bi < batch; bi++) {
          int aBase = bi * mDim * kDim;
          int oBase = bi * mDim * nDim;
          for (int i = 0; i < mDim; i++) {
            for (int j = 0; j < nDim; j++) {
              float acc = 0f;
              for (int k = 0; k < kDim; k++) {
                acc += a.f[aBase + i * kDim + k] * b.f[k * nDim + j];
              }
              out[oBase + i * nDim + j] = acc;
            }
          }
        }
        long[] shape = a.shape.clone();
        shape[rank - 1] = nDim;
        return Tensor.floats(out, shape);
      }
      case "Tanh": {
        Tensor a = in(n, env, 0);
        if (a.dtype != 1) throw new IllegalArgumentException("Tanh needs a float input");
        float[] f = new float[a.f.length];
        for (int i = 0; i < f.length; i++) f[i] = (float) Math.tanh(a.f[i]);
        return Tensor.floats(f, a.shape.clone());
      }
      default:
        throw new IllegalArgumentException("unsupported op " + n.op + " (node " + n.name + ")");
    }
  }
}
