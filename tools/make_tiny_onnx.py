#!/usr/bin/env python3
"""Emit src/test/resources/models/tiny_matmul.onnx — a tiny, VALID ONNX
model hand-encoded from the public onnx.proto3 schema (no onnx package
needed; this container has no egress). The graph is the minimal
"token ids -> per-token hidden states" shape OnnxEmbedder consumes
(reference src/embed.py:25-41 exports a sentence encoder the same way):

    input_ids  int64  [1, N]
      Cast(to=FLOAT)          -> ids_f   [1, N]
      Reshape([1, -1, 1])     -> ids_3d  [1, N, 1]
      MatMul(W [1, DIM])      -> mm      [1, N, DIM]
      Tanh                    -> last_hidden_state [1, N, DIM]

so hidden[t][j] = tanh(float(id_t) * W[j]) — a real (if small) forward
pass with data-dependent per-token states. W = [1,-2,...,-8]/32768 keeps
products inside tanh's non-saturated range for hashed-vocab ids (< 30522
< 2^15), so outputs vary with the token, and every constant is exactly
representable in float32 for bit-stable test expectations.

Field numbers below are the public onnx.proto3 definitions:
ModelProto{1 ir_version, 2 producer_name, 7 graph, 8 opset_import},
GraphProto{1 node, 2 name, 5 initializer, 11 input, 12 output},
NodeProto{1 input, 2 output, 3 name, 4 op_type, 5 attribute},
AttributeProto{1 name, 3 i, 20 type(INT=2)},
TensorProto{1 dims, 2 data_type(FLOAT=1, INT64=7), 8 name, 9 raw_data},
ValueInfoProto{1 name, 2 type}, TypeProto{1 tensor_type{1 elem_type,
2 shape{1 dim{1 dim_value | 3 dim_param}}}}.

Usage: python3 tools/make_tiny_onnx.py  (rewrites the committed model)
"""
import struct
import os

DIM = 8
W = [(1, -2, 3, -4, 5, -6, 7, -8)[j] / 32768.0 for j in range(DIM)]


def varint(n: int) -> bytes:
    assert n >= 0
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def tag(field: int, wire: int) -> bytes:
    return varint((field << 3) | wire)


def vint(field: int, n: int) -> bytes:          # wire type 0
    return tag(field, 0) + varint(n)


def blob(field: int, payload: bytes) -> bytes:  # wire type 2
    return tag(field, 2) + varint(len(payload)) + payload


def string(field: int, s: str) -> bytes:
    return blob(field, s.encode("utf-8"))


def tensor_f32(name: str, dims, values) -> bytes:
    return (b"".join(vint(1, d) for d in dims) + vint(2, 1) +
            string(8, name) + blob(9, struct.pack(f"<{len(values)}f", *values)))


def tensor_i64(name: str, dims, values) -> bytes:
    return (b"".join(vint(1, d) for d in dims) + vint(2, 7) +
            string(8, name) + blob(9, struct.pack(f"<{len(values)}q", *values)))


def attr_int(name: str, value: int) -> bytes:
    return string(1, name) + vint(3, value) + vint(20, 2)  # type=INT


def node(op: str, inputs, outputs, name: str, attrs=b"") -> bytes:
    return (b"".join(string(1, i) for i in inputs) +
            b"".join(string(2, o) for o in outputs) +
            string(3, name) + string(4, op) +
            (blob(5, attrs) if attrs else b""))


def dim_value(n: int) -> bytes:
    return blob(1, vint(1, n))


def dim_param(p: str) -> bytes:
    return blob(1, string(3, p))


def value_info(name: str, elem_type: int, dims) -> bytes:
    shape = b"".join(dim_value(d) if isinstance(d, int) else dim_param(d)
                     for d in dims)
    tensor_type = vint(1, elem_type) + blob(2, shape)
    return string(1, name) + blob(2, blob(1, tensor_type))


graph = (
    blob(1, node("Cast", ["input_ids"], ["ids_f"], "cast0",
                 attr_int("to", 1))) +
    blob(1, node("Reshape", ["ids_f", "reshape_shape"], ["ids_3d"],
                 "reshape0")) +
    blob(1, node("MatMul", ["ids_3d", "W"], ["mm"], "matmul0")) +
    blob(1, node("Tanh", ["mm"], ["last_hidden_state"], "tanh0")) +
    string(2, "tiny_matmul") +
    blob(5, tensor_i64("reshape_shape", [3], [1, -1, 1])) +
    blob(5, tensor_f32("W", [1, DIM], W)) +
    blob(11, value_info("input_ids", 7, [1, "N"])) +
    blob(12, value_info("last_hidden_state", 1, [1, "N", DIM])))

model = (vint(1, 8) +                       # ir_version 8
         string(2, "graft-make-tiny-onnx") +
         blob(7, graph) +
         blob(8, vint(2, 13)))              # opset {domain "", version 13}

out = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "models", "tiny_matmul.onnx")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "wb") as f:
    f.write(model)
print(f"wrote {os.path.normpath(out)} ({len(model)} bytes)")
