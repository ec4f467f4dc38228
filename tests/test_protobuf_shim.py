"""Unit coverage for the vendored pure-Python protobuf shim
(vendor/google/protobuf): wire-format round-trips through the REAL
pyspark-generated StateMessage_pb2 module, plus decoder robustness.

The end-to-end proof is test_scale_sources.py::
test_running_type_counts_v2_plan_and_exec, which runs the full
transformWithStateInPandas wire protocol against the JVM state server;
these tests pin the shim's encode/decode semantics in isolation."""

from __future__ import annotations

import pytest

from bigdata_etl_elt_dashboard_spark.vendor import ensure_protobuf

if not ensure_protobuf():  # pragma: no cover
    pytest.skip("protobuf shim unavailable", allow_module_level=True)

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402

from google.protobuf.internal import wire  # noqa: E402  (resolves to shim)


def test_varint_roundtrip_boundaries():
    for v in [0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1, -1, -2**63]:
        buf = wire.encode_varint(v)
        got, pos = wire.decode_varint(buf, 0)
        assert pos == len(buf)
        assert wire.to_signed(got) == v


def test_nested_oneof_roundtrip():
    msg = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)
        ),
    )
    back = sm.StateRequest()
    back.ParseFromString(msg.SerializeToString())
    assert back.version == 2
    assert back.statefulProcessorCall.setHandleState.state == sm.DATA_PROCESSED
    # unset oneof members read as default instances without presence
    assert not back.HasField("implicitGroupingKeyRequest")


def test_empty_oneof_member_keeps_presence():
    # RemoveImplicitKey serializes to zero payload bytes but MUST appear
    # on the wire (it selects the oneof member)
    req = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    data = req.SerializeToString()
    assert data  # tag + length 0
    back = sm.ImplicitGroupingKeyRequest()
    back.ParseFromString(data)
    assert back.HasField("removeImplicitKey")
    assert not back.HasField("setImplicitKey")


def test_repeated_message_and_bool_roundtrip():
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b""),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b""),
    ]
    assert back.requireNextFetch is True
    assert back.statusCode == 0
    assert back.errorMessage == ""


def test_repeated_bytes_and_negative_int64():
    lst = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=False)
    back = sm.ListStatePut()
    back.ParseFromString(lst.SerializeToString())
    assert back.value == [b"a", b"bb", b""]
    assert back.fetchWithArrow is False

    t = sm.RegisterTimer(expiryTimestampMs=-1)
    back_t = sm.RegisterTimer()
    back_t.ParseFromString(t.SerializeToString())
    assert back_t.expiryTimestampMs == -1


def test_unknown_fields_skipped():
    # a StateResponse payload parsed as TTLConfig: field numbers 2/3 are
    # unknown there and must be skipped, not crash
    payload = sm.StateResponse(
        statusCode=7, errorMessage="boom", value=b"xyz"
    ).SerializeToString()
    cfg = sm.TTLConfig()
    cfg.ParseFromString(payload)
    # field 1 is int64 durationMs in TTLConfig and int32 statusCode in
    # StateResponse — same varint wire type, so it decodes as 7
    assert cfg.durationMs == 7


def test_string_fields_utf8():
    cmd = sm.StateCallCommand(
        stateName="counts", schema="k string", mapStateValueSchema="n long"
    )
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert (back.stateName, back.schema, back.mapStateValueSchema) == (
        "counts",
        "k string",
        "n long",
    )
    # TTL sub-message unset: default instance, no presence
    assert back.ttl.durationMs == 0
    assert not back.HasField("ttl")


def test_packed_repeated_varint_decode():
    # proto3 packs repeated numeric fields by default: a LEN payload on a
    # varint-typed repeated field is a back-to-back varint sequence.
    # StateMessage's repeated scalars are bytes-only, so synthesize a
    # message with repeated int64 / bool fields and hand-craft the wire.
    from google.protobuf.internal import builder as _b
    from google.protobuf.descriptor import Descriptor, FieldDescriptor as FD

    desc = Descriptor(
        name="PackedProbe",
        full_name="shimtest.PackedProbe",
        fields=[
            FD("nums", 1, FD.TYPE_INT64, FD.LABEL_REPEATED),
            FD("flags", 2, FD.TYPE_BOOL, FD.LABEL_REPEATED),
        ],
        oneofs=[],
        nested_types=[],
        enum_types=[],
    )
    cls = _b._make_message_class(desc, "shimtest")

    payload = b"".join(wire.encode_varint(v) for v in [0, 1, 300, 2**63 - 1])
    data = (
        wire.encode_len_delimited(1, payload)
        + wire.encode_len_delimited(2, wire.encode_varint(1) + wire.encode_varint(0))
        # expanded (unpacked) encoding of the same field must still
        # accumulate alongside packed chunks
        + wire.encode_tag(1, wire.WIRETYPE_VARINT)
        + wire.encode_varint(7)
    )
    msg = cls()
    msg.ParseFromString(data)
    assert msg.nums == [0, 1, 300, 2**63 - 1, 7]
    assert msg.flags == [True, False]


def test_nested_write_through_presence_cascades():
    # real-protobuf lazy materialization: writing through a chain of
    # default sub-message reads must set presence at EVERY level
    req = sm.StateRequest()
    req.statefulProcessorCall.getMapState.stateName = "m"
    assert req.HasField("statefulProcessorCall")
    assert req.statefulProcessorCall.HasField("getMapState")
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.statefulProcessorCall.getMapState.stateName == "m"
    # and a pure read chain still creates NO presence
    r2 = sm.StateRequest()
    _ = r2.statefulProcessorCall.getMapState.stateName
    assert not r2.HasField("statefulProcessorCall")


def test_copyfrom_through_default_submessage_sets_presence():
    src = sm.TTLConfig(durationMs=9)
    cmd = sm.StateCallCommand()
    cmd.ttl.CopyFrom(src)
    assert cmd.HasField("ttl") and cmd.ttl.durationMs == 9


def test_parsefromstring_through_default_submessage_sets_presence():
    # populating a hooked default instance via ParseFromString is a WRITE:
    # presence must cascade exactly like CopyFrom / scalar assignment
    src = sm.TTLConfig(durationMs=9)
    cmd = sm.StateCallCommand()
    cmd.ttl.ParseFromString(src.SerializeToString())
    assert cmd.HasField("ttl") and cmd.ttl.durationMs == 9
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 9


def test_repeated_mutation_through_default_submessage_sets_presence():
    # msg.sub.items.append(x) memoizes the list on a hooked default
    # instance; the mutation must materialize the presence chain so the
    # data survives the next read of msg.sub (real-protobuf lazy
    # write-through semantics for repeated fields)
    from google.protobuf.internal import builder as _b
    from google.protobuf.descriptor import Descriptor, FieldDescriptor as FD

    inner = Descriptor(
        name="RepInner",
        full_name="shimtest.RepInner",
        fields=[FD("items", 1, FD.TYPE_INT64, FD.LABEL_REPEATED)],
        oneofs=[],
        nested_types=[],
        enum_types=[],
    )
    fd_sub = FD("sub", 1, FD.TYPE_MESSAGE, FD.LABEL_OPTIONAL)
    outer = Descriptor(
        name="RepOuter",
        full_name="shimtest.RepOuter",
        fields=[fd_sub],
        oneofs=[],
        nested_types=[],
        enum_types=[],
    )
    _b._make_message_class(inner, "shimtest")
    outer_cls = _b._make_message_class(outer, "shimtest")
    fd_sub.message_type = inner

    msg = outer_cls()
    msg.sub.items.append(5)
    assert msg.HasField("sub")
    msg.sub.items.extend([6, 7])
    assert list(msg.sub.items) == [5, 6, 7]
    back = outer_cls()
    back.ParseFromString(msg.SerializeToString())
    assert list(back.sub.items) == [5, 6, 7]

    # a bare READ of the repeated field still creates no presence
    m2 = outer_cls()
    _ = list(m2.sub.items)
    assert not m2.HasField("sub")
