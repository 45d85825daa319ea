/* C ABI wrapper around the reference encoder/decoder (/root/reference) so the
 * Python test-suite can load it via ctypes and use it as a conformance oracle.
 *
 * Framing convention: the encoder owns a scratch bit_stream that is emptied
 * before every encode() call, so each call returns the exact byte chunk for
 * one frame (the first chunk additionally carries the 14-byte stream header).
 * The reference decoder empties its input after each frame
 * (/root/reference/evx1dec.cpp:120), so feeding it per-frame chunks through
 * assign() reproduces the intended streaming behavior.
 */

#include "evx1.h"
#include "evx1enc.h"
#include "evx1dec.h"

#include <string.h>

using namespace evx;

namespace {

struct oracle_encoder {
    evx1_encoder *enc;
    bit_stream *stream;
};

struct oracle_decoder {
    evx1_decoder *dec;
    bit_stream *stream;
};

} // namespace

extern "C" {

void *evxo_encoder_create(unsigned int capacity_bytes) {
    oracle_encoder *oe = new oracle_encoder();
    create_encoder(&oe->enc);
    oe->stream = new bit_stream(capacity_bytes * 8u);
    return oe;
}

void evxo_encoder_destroy(void *handle) {
    oracle_encoder *oe = static_cast<oracle_encoder *>(handle);
    destroy_encoder(oe->enc);
    delete oe->stream;
    delete oe;
}

int evxo_encoder_set_quality(void *handle, unsigned char quality) {
    oracle_encoder *oe = static_cast<oracle_encoder *>(handle);
    return oe->enc->set_quality(quality);
}

int evxo_encoder_insert_intra(void *handle) {
    oracle_encoder *oe = static_cast<oracle_encoder *>(handle);
    return oe->enc->insert_intra();
}

/* Encodes one RGB24 frame. Returns status; *out_bytes receives the chunk
 * length, *out_bits the exact bit occupancy (the tail byte may be partial). */
int evxo_encode(void *handle, unsigned char *rgb, unsigned int width,
                unsigned int height, unsigned char *out_buf,
                unsigned int out_capacity, unsigned int *out_bytes,
                unsigned int *out_bits) {
    oracle_encoder *oe = static_cast<oracle_encoder *>(handle);
    oe->stream->empty();
    evx_status result = oe->enc->encode(rgb, width, height, oe->stream);
    if (result != EVX_SUCCESS) {
        return result;
    }
    unsigned int bytes = oe->stream->query_byte_occupancy();
    if (bytes > out_capacity) {
        return EVX_ERROR_CAPACITY_LIMIT;
    }
    memcpy(out_buf, oe->stream->query_data(), bytes);
    *out_bytes = bytes;
    *out_bits = oe->stream->query_occupancy();
    return EVX_SUCCESS;
}

int evxo_encoder_peek(void *handle, int peek_state, unsigned char *out_rgb) {
    oracle_encoder *oe = static_cast<oracle_encoder *>(handle);
    return oe->enc->peek(static_cast<EVX_PEEK_STATE>(peek_state), out_rgb);
}

void *evxo_decoder_create(void) {
    oracle_decoder *od = new oracle_decoder();
    create_decoder(&od->dec);
    od->stream = new bit_stream();
    return od;
}

void evxo_decoder_destroy(void *handle) {
    oracle_decoder *od = static_cast<oracle_decoder *>(handle);
    destroy_decoder(od->dec);
    delete od->stream;
    delete od;
}

/* Decodes one frame chunk into out_rgb (must be width*height*3 bytes). */
int evxo_decode(void *handle, unsigned char *chunk, unsigned int chunk_bytes,
                unsigned char *out_rgb) {
    oracle_decoder *od = static_cast<oracle_decoder *>(handle);
    if (od->stream->assign(chunk, chunk_bytes) != EVX_SUCCESS) {
        return EVX_ERROR_INVALIDARG;
    }
    return od->dec->decode(od->stream, out_rgb);
}

} // extern "C"
