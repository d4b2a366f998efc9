"""Non-self-referential oracles for the HPACK layer of
sources/grpc_client.py: RFC 7541 Appendix C test vectors. The
velociraptor loopback e2e exercises encoder<->decoder against each
other, which cannot catch a shared misreading of the spec — a real
gRPC server (grpc-go in Velociraptor) huffman-codes and indexes its
response headers, so the decoder must match the RFC bit-for-bit."""

import pytest

from tenzir_spark.sources.grpc_client import (
    HpackDecoder,
    HpackEncoder,
    huffman_decode,
)


def test_huffman_rfc7541_appendix_c_strings():
    # C.4.1 / C.4.2 / C.6.1 huffman-coded string literals
    assert huffman_decode(bytes.fromhex("f1e3c2e5f23a6ba0ab90f4ff")) == \
        b"www.example.com"
    assert huffman_decode(bytes.fromhex("a8eb10649cbf")) == b"no-cache"
    assert huffman_decode(bytes.fromhex("25a849e95ba97d7f")) == b"custom-key"
    assert huffman_decode(bytes.fromhex("25a849e95bb8e8b4bf")) == \
        b"custom-value"
    # C.6.1 response strings (multi-byte, digits, punctuation)
    assert huffman_decode(bytes.fromhex("6402")) == b"302"
    assert huffman_decode(bytes.fromhex(
        "d07abe941054d444a8200595040b8166e082a62d1bff")) == \
        b"Mon, 21 Oct 2013 20:13:21 GMT"
    assert huffman_decode(bytes.fromhex(
        "9d29ad171863c78f0b97c8e9ae82ae43d3")) == b"https://www.example.com"


def test_huffman_rejects_bad_padding_and_eos():
    # padding must be a prefix of EOS (all ones), at most 7 bits
    with pytest.raises(ValueError):
        # 'www.example.com' huffman with the final padding byte zeroed
        huffman_decode(bytes.fromhex("f1e3c2e5f23a6ba0ab90f400"))


def test_hpack_rfc7541_c4_request_sequence():
    """C.4: three huffman-coded requests on one connection — static
    refs, incremental indexing, and dynamic-table reuse across blocks."""
    dec = HpackDecoder()
    first = dec.decode(bytes.fromhex("828684418cf1e3c2e5f23a6ba0ab90f4ff"))
    assert first == [(":method", "GET"), (":scheme", "http"),
                     (":path", "/"), (":authority", "www.example.com")]
    second = dec.decode(bytes.fromhex("828684be5886a8eb10649cbf"))
    assert second == [(":method", "GET"), (":scheme", "http"),
                      (":path", "/"), (":authority", "www.example.com"),
                      ("cache-control", "no-cache")]
    third = dec.decode(bytes.fromhex(
        "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf"))
    assert third == [(":method", "GET"), (":scheme", "https"),
                     (":path", "/index.html"),
                     (":authority", "www.example.com"),
                     ("custom-key", "custom-value")]


def test_hpack_rfc7541_c5_response_sequence_with_eviction():
    """C.5: responses against a 256-byte dynamic table — exercises
    eviction, which the loopback e2e never triggers."""
    dec = HpackDecoder(max_table_size=256)
    first = dec.decode(bytes.fromhex(
        "4803333032580770726976617465611d4d6f6e2c203231204f637420323031"
        "332032303a31333a323120474d546e1768747470733a2f2f7777772e657861"
        "6d706c652e636f6d"))
    assert first == [
        (":status", "302"), ("cache-control", "private"),
        ("date", "Mon, 21 Oct 2013 20:13:21 GMT"),
        ("location", "https://www.example.com")]
    second = dec.decode(bytes.fromhex("4803333037c1c0bf"))
    assert second[0] == (":status", "307")
    assert second[1:] == first[1:]
    # after block two the :status 302 entry was evicted (table cap)
    assert (":status", "302") not in dec.dynamic


def test_encoder_output_decodes_with_fresh_decoder():
    headers = [(":method", "POST"), (":path", "/proto.API/Query"),
               ("content-type", "application/grpc"), ("te", "trailers"),
               ("x-custom", "v1")]
    assert HpackDecoder().decode(HpackEncoder().encode(headers)) == headers
