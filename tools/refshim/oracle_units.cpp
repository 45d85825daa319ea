/* Unit-level C ABI exports from the reference, for per-kernel differential
 * tests (transform, quantize, convert, lerp, deblock, motion search).
 * Planes are passed as raw int16 buffers with explicit dims.
 */

#include "evx1.h"
#include "common.h"
#include "convert.h"
#include "macroblock.h"
#include "motion.h"
#include "quantize.h"
#include "transform.h"
#include "analysis.h"
#include "stream.h"

#include <string.h>

using namespace evx;

namespace evx {
// not declared in a header; defined in deblock.cpp
evx_status deblock_image_filter(evx_block_desc *block_table, image_set *target_image);
// not declared in transform.h; defined in transform.cpp
void transform_16x16_line(int16 *src, uint32 src_pitch, int16 *dest, uint32 dest_pitch);
void inverse_transform_16x16_line(int16 *src, uint32 src_pitch, int16 *dest, uint32 dest_pitch);
}

extern "C" {

void evxu_transform_8x8(short *src, unsigned int pitch, short *dest) {
    transform_8x8(src, pitch, dest, pitch);
}

void evxu_inverse_transform_8x8(short *src, unsigned int pitch, short *dest) {
    inverse_transform_8x8(src, pitch, dest, pitch);
}

void evxu_inverse_transform_add_8x8(short *src, short *add, unsigned int pitch, short *dest) {
    inverse_transform_add_8x8(src, pitch, add, pitch, dest, pitch);
}

void evxu_transform_4x4(short *src, unsigned int pitch, short *dest) {
    transform_4x4(src, pitch, dest, pitch);
}

void evxu_inverse_transform_4x4(short *src, unsigned int pitch, short *dest) {
    inverse_transform_4x4(src, pitch, dest, pitch);
}

void evxu_transform_16x16_line(short *src, unsigned int pitch, short *dest,
                               unsigned int dest_pitch) {
    transform_16x16_line(src, pitch, dest, dest_pitch);
}

void evxu_inverse_transform_16x16_line(short *src, unsigned int pitch,
                                       short *dest, unsigned int dest_pitch) {
    inverse_transform_16x16_line(src, pitch, dest, dest_pitch);
}

void evxu_sub_transform_8x8(short *src, short *sub, unsigned int pitch, short *dest) {
    sub_transform_8x8(src, pitch, sub, pitch, dest, pitch);
}

/* Builds a macroblock view over caller YUV planes at (x, y). */
static macroblock make_block(short *y, short *u, short *v, unsigned int y_width,
                             unsigned int px, unsigned int py) {
    macroblock b;
    b.data_y = y + py * y_width + px;
    b.data_u = u + (py >> 1) * (y_width >> 1) + (px >> 1);
    b.data_v = v + (py >> 1) * (y_width >> 1) + (px >> 1);
    b.stride = y_width;
    return b;
}

void evxu_quantize_macroblock(unsigned char qp, int block_type,
                              short *y, short *u, short *v,
                              short *oy, short *ou, short *ov,
                              unsigned int y_width,
                              unsigned int px, unsigned int py) {
    macroblock src = make_block(y, u, v, y_width, px, py);
    macroblock dst = make_block(oy, ou, ov, y_width, px, py);
    quantize_macroblock(qp, (EVX_BLOCK_TYPE) block_type, src, &dst);
}

void evxu_inverse_quantize_macroblock(unsigned char qp, int block_type,
                                      short *y, short *u, short *v,
                                      short *oy, short *ou, short *ov,
                                      unsigned int y_width,
                                      unsigned int px, unsigned int py) {
    macroblock src = make_block(y, u, v, y_width, px, py);
    macroblock dst = make_block(oy, ou, ov, y_width, px, py);
    inverse_quantize_macroblock(qp, (EVX_BLOCK_TYPE) block_type, src, &dst);
}

int evxu_query_qp(unsigned char quality, short *y, short *u, short *v,
                  unsigned int y_width, int block_type) {
    macroblock b = make_block(y, u, v, y_width, 0, 0);
    return query_block_quantization_parameter(quality, b, (EVX_BLOCK_TYPE) block_type);
}

int evxu_block_variance2(short *y, unsigned int y_width) {
    macroblock b;
    b.data_y = y; b.data_u = 0; b.data_v = 0; b.stride = y_width;
    return compute_block_variance2(b);
}

void evxu_lerp_half(short *ay, short *au, short *av,
                    short *by, short *bu, short *bv,
                    short *oy, short *ou, short *ov, unsigned int y_width) {
    macroblock a = make_block(ay, au, av, y_width, 0, 0);
    macroblock b = make_block(by, bu, bv, y_width, 0, 0);
    macroblock o = make_block(oy, ou, ov, y_width, 0, 0);
    lerp_macroblock_half(a, b, &o);
}

void evxu_lerp_quarter(short *ay, short *au, short *av,
                       short *by, short *bu, short *bv,
                       short *oy, short *ou, short *ov, unsigned int y_width) {
    macroblock a = make_block(ay, au, av, y_width, 0, 0);
    macroblock b = make_block(by, bu, bv, y_width, 0, 0);
    macroblock o = make_block(oy, ou, ov, y_width, 0, 0);
    lerp_macroblock_quarter(a, b, &o);
}

void evxu_convert_rgb_to_yuv(unsigned char *rgb, unsigned int width,
                             unsigned int height, short *y, short *u, short *v,
                             unsigned int yw, unsigned int yh) {
    image rgb_image;
    create_image(EVX_IMAGE_FORMAT_R8G8B8, rgb, width, height, &rgb_image);
    image yi, ui, vi;
    create_image(EVX_IMAGE_FORMAT_R16S, y, yw, yh, &yi);
    create_image(EVX_IMAGE_FORMAT_R16S, u, yw >> 1, yh >> 1, &ui);
    create_image(EVX_IMAGE_FORMAT_R16S, v, yw >> 1, yh >> 1, &vi);
    convert_image(rgb_image, &yi, &ui, &vi);
}

void evxu_convert_yuv_to_rgb(short *y, short *u, short *v, unsigned int yw,
                             unsigned int yh, unsigned char *rgb,
                             unsigned int width, unsigned int height) {
    image rgb_image;
    create_image(EVX_IMAGE_FORMAT_R8G8B8, rgb, width, height, &rgb_image);
    image yi, ui, vi;
    create_image(EVX_IMAGE_FORMAT_R16S, y, yw, yh, &yi);
    create_image(EVX_IMAGE_FORMAT_R16S, u, yw >> 1, yh >> 1, &ui);
    create_image(EVX_IMAGE_FORMAT_R16S, v, yw >> 1, yh >> 1, &vi);
    convert_image(yi, ui, vi, &rgb_image);
}

/* Motion search over caller-provided prediction planes.
 * desc_out: [block_type, pred_target, motion_x, motion_y, sp_pred, sp_amount,
 *            sp_index] as int32; returns best_sad. */
static int run_prediction(int is_intra, unsigned short quality,
                          unsigned int frame_index, unsigned char pred_offset,
                          short *sy, short *su, short *sv,
                          short *py, short *pu, short *pv,
                          unsigned int width, unsigned int height,
                          unsigned int px_, unsigned int py_, int *desc_out) {
    evx_frame frame;
    frame.type = is_intra ? EVX_FRAME_INTRA : EVX_FRAME_INTER;
    frame.index = frame_index;
    frame.quality = quality;

    evx_cache_bank bank;  // default-constructed; only the fields used below matter
    // Wrap the caller's prediction planes as the ring slot the search uses.
    unsigned int slot = query_prediction_index_by_offset(frame, pred_offset);
    image *yi = bank.prediction_cache[slot].query_y_image();
    image *ui = bank.prediction_cache[slot].query_u_image();
    image *vi = bank.prediction_cache[slot].query_v_image();
    create_image(EVX_IMAGE_FORMAT_R16S, py, width, height, yi);
    create_image(EVX_IMAGE_FORMAT_R16S, pu, width >> 1, height >> 1, ui);
    create_image(EVX_IMAGE_FORMAT_R16S, pv, width >> 1, height >> 1, vi);

    // motion interpolation scratch
    static short my[16 * 16], mu[8 * 8], mv[8 * 8];
    bank.motion_block.data_y = my;
    bank.motion_block.data_u = mu;
    bank.motion_block.data_v = mv;
    bank.motion_block.stride = 16;

    macroblock src = make_block(sy, su, sv, width, px_, py_);

    evx_block_desc desc;
    int sad;
    if (is_intra) {
        sad = calculate_intra_prediction(frame, src, px_, py_, &bank, &desc);
    } else {
        sad = calculate_inter_prediction(frame, src, px_, py_, &bank, pred_offset, &desc);
    }
    desc_out[0] = desc.block_type;
    desc_out[1] = desc.prediction_target;
    desc_out[2] = desc.motion_x;
    desc_out[3] = desc.motion_y;
    desc_out[4] = desc.sp_pred;
    desc_out[5] = desc.sp_amount;
    desc_out[6] = desc.sp_index;
    return sad;
}

int evxu_intra_prediction(unsigned short quality, unsigned int frame_index,
                          short *sy, short *su, short *sv,
                          short *py, short *pu, short *pv,
                          unsigned int width, unsigned int height,
                          unsigned int px, unsigned int py_, int *desc_out) {
    return run_prediction(1, quality, frame_index, 0, sy, su, sv, py, pu, pv,
                          width, height, px, py_, desc_out);
}

int evxu_inter_prediction(unsigned short quality, unsigned int frame_index,
                          unsigned char pred_offset,
                          short *sy, short *su, short *sv,
                          short *py, short *pu, short *pv,
                          unsigned int width, unsigned int height,
                          unsigned int px, unsigned int py_, int *desc_out) {
    return run_prediction(0, quality, frame_index, pred_offset, sy, su, sv,
                          py, pu, pv, width, height, px, py_, desc_out);
}

/* Deblock filter over caller planes given a flat int32 block table
 * [type, pred_target, mx, my, sp_pred, sp_amount, sp_index, q_index] per MB. */
void evxu_deblock(short *y, short *u, short *v, unsigned int width,
                  unsigned int height, int *table, unsigned int n_blocks) {
    image_set target;
    create_image(EVX_IMAGE_FORMAT_R16S, y, width, height, target.query_y_image());
    create_image(EVX_IMAGE_FORMAT_R16S, u, width >> 1, height >> 1, target.query_u_image());
    create_image(EVX_IMAGE_FORMAT_R16S, v, width >> 1, height >> 1, target.query_v_image());

    evx_block_desc *bt = new evx_block_desc[n_blocks];
    for (unsigned int i = 0; i < n_blocks; ++i) {
        memset(&bt[i], 0, sizeof(evx_block_desc));
        bt[i].block_type = (EVX_BLOCK_TYPE) table[i * 8 + 0];
        bt[i].prediction_target = table[i * 8 + 1];
        bt[i].motion_x = table[i * 8 + 2];
        bt[i].motion_y = table[i * 8 + 3];
        bt[i].sp_pred = table[i * 8 + 4];
        bt[i].sp_amount = table[i * 8 + 5];
        bt[i].sp_index = table[i * 8 + 6];
        bt[i].q_index = table[i * 8 + 7];
    }
    deblock_image_filter(bt, &target);
    delete[] bt;
}

/* ---- lossless backend wrappers (stream.h), buffer-level ------------- */

static long long drain_bits(bit_stream *bs, unsigned char *out,
                            unsigned long long cap) {
    unsigned long long nbits = bs->query_occupancy();
    if ((nbits + 7) / 8 > cap) return -1;
    memset(out, 0, (size_t) ((nbits + 7) / 8));
    for (unsigned long long i = 0; i < nbits; ++i) {
        uint8 bit = 0;
        bs->read_bit(&bit);
        out[i >> 3] |= (bit & 1) << (i & 7);
    }
    return (long long) nbits;
}

/* Huffman precoder: values in [0,7]. Returns bit count or -1. */
long long evxu_huffman_encode(const unsigned char *values, unsigned count,
                              unsigned char *out, unsigned long long cap) {
    bit_stream bs;
    bs.resize_capacity(8 * (count + 16));
    for (unsigned i = 0; i < count; ++i)
        if (EVX_SUCCESS != stream_encode_huffman_value(values[i], &bs))
            return -1;
    return drain_bits(&bs, out, cap);
}

long long evxu_huffman_decode(const unsigned char *data,
                              unsigned long long nbits, unsigned count,
                              unsigned char *out) {
    bit_stream bs;
    bs.resize_capacity(((nbits + 7) / 8) * 8);
    bs.assign((void *) data, (nbits + 7) / 8);
    for (unsigned i = 0; i < count; ++i)
        out[i] = (unsigned char) stream_decode_huffman_value(&bs, out + i);
    return (long long) count;
}

/* Plain golomb value streams (no ABAC). signed=1 -> int16 values. */
long long evxu_golomb_encode(const short *values, unsigned count, int is_signed,
                             unsigned char *out, unsigned long long cap) {
    bit_stream bs;
    bs.resize_capacity(64 * (count + 16));
    for (unsigned i = 0; i < count; ++i) {
        evx_status s = is_signed
            ? stream_encode_value((int16) values[i], &bs)
            : stream_encode_value((uint16) values[i], &bs);
        if (EVX_SUCCESS != s) return -1;
    }
    return drain_bits(&bs, out, cap);
}

long long evxu_golomb_decode(const unsigned char *data,
                             unsigned long long nbits, unsigned count,
                             int is_signed, short *out) {
    bit_stream bs;
    bs.resize_capacity(((nbits + 7) / 8) * 8);
    bs.assign((void *) data, (nbits + 7) / 8);
    for (unsigned i = 0; i < count; ++i) {
        if (is_signed) {
            int16 v = 0;
            if (EVX_SUCCESS != stream_decode_value(&bs, &v)) return -1;
            out[i] = v;
        } else {
            uint16 v = 0;
            if (EVX_SUCCESS != stream_decode_value(&bs, &v)) return -1;
            out[i] = (short) v;
        }
    }
    return (long long) count;
}

/* Golomb -> ABAC value streams; one adaptive coder spans the buffer and is
 * flushed at the end (the slice pattern). mode: 0 = int16 values,
 * 1 = uint16 values, 2/3/4 = zigzag block coders (4x4/8x8/16x16, count =
 * number of blocks, values = row-major blocks), 5 = RLE 8x8 blocks. */
long long evxu_entropy_encode(const short *values, unsigned count, int mode,
                              unsigned char *out, unsigned long long cap) {
    bit_stream feed, output;
    feed.resize_capacity(1 << 22);
    output.resize_capacity(1 << 22);
    entropy_coder coder;
    evx_status s = EVX_SUCCESS;
    switch (mode) {
    case 0:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_stream_encode_value((int16) values[i], &feed, &coder,
                                            &output);
        break;
    case 1:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_stream_encode_value((uint16) values[i], &feed, &coder,
                                            &output);
        break;
    case 2:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_stream_encode_4x4((int16 *) values + 16 * i, &feed,
                                          &coder, &output);
        break;
    case 3:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_stream_encode_8x8((int16 *) values + 64 * i, &feed,
                                          &coder, &output);
        break;
    case 4:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_stream_encode_16x16((int16 *) values + 256 * i, &feed,
                                            &coder, &output);
        break;
    case 5:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_rle_stream_encode_8x8((int16 *) values + 64 * i, &feed,
                                              &coder, &output);
        break;
    default:
        return -1;
    }
    if (s != EVX_SUCCESS) return -1;
    coder.finish_encode(&output);
    return drain_bits(&output, out, cap);
}

long long evxu_entropy_decode(const unsigned char *data,
                              unsigned long long nbits, unsigned count,
                              int mode, short *out) {
    bit_stream input, feed;
    input.resize_capacity(((nbits + 7) / 8) * 8);
    input.assign((void *) data, (nbits + 7) / 8);
    feed.resize_capacity(1 << 22);
    entropy_coder coder;
    coder.start_decode(&input);
    evx_status s = EVX_SUCCESS;
    switch (mode) {
    case 0:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_stream_decode_value(&input, &coder, &feed,
                                            (int16 *) out + i);
        break;
    case 1:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_stream_decode_value(&input, &coder, &feed,
                                            (uint16 *) out + i);
        break;
    case 2:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_stream_decode_4x4(&input, &coder, &feed,
                                          (int16 *) out + 16 * i);
        break;
    case 3:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_stream_decode_8x8(&input, &coder, &feed,
                                          (int16 *) out + 64 * i);
        break;
    case 4:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_stream_decode_16x16(&input, &coder, &feed,
                                            (int16 *) out + 256 * i);
        break;
    case 5:
        for (unsigned i = 0; i < count && s == EVX_SUCCESS; ++i)
            s = entropy_rle_stream_decode_8x8(&input, &coder, &feed,
                                              (int16 *) out + 64 * i);
        break;
    default:
        return -1;
    }
    return s == EVX_SUCCESS ? (long long) count : -1;
}

} // extern "C"

// ----- analysis.h metric helpers (library-parity differential tests) -----

extern "C" int evxu_block_sad2(short *ly, short *ry, unsigned int y_width) {
    macroblock l, r;
    l.data_y = ly; l.data_u = 0; l.data_v = 0; l.stride = y_width;
    r.data_y = ry; r.data_u = 0; r.data_v = 0; r.stride = y_width;
    return compute_block_sad(l, r);
}

extern "C" int evxu_block_sad1(short *dy, unsigned int y_width) {
    macroblock d;
    d.data_y = dy; d.data_u = 0; d.data_v = 0; d.stride = y_width;
    return compute_block_sad(d);
}

extern "C" int evxu_block_mse(short *ly, short *ry, unsigned int y_width) {
    macroblock l, r;
    l.data_y = ly; l.data_u = 0; l.data_v = 0; l.stride = y_width;
    r.data_y = ry; r.data_u = 0; r.data_v = 0; r.stride = y_width;
    return compute_block_mse(l, r);
}

extern "C" int evxu_block_ssd(short *ly, short *ry, unsigned int y_width) {
    macroblock l, r;
    l.data_y = ly; l.data_u = 0; l.data_v = 0; l.stride = y_width;
    r.data_y = ry; r.data_u = 0; r.data_v = 0; r.stride = y_width;
    return compute_block_ssd(l, r);
}

extern "C" int evxu_block_mad(short *ly, short *lu, short *lv,
                              short *ry, short *ru, short *rv,
                              unsigned int y_width) {
    macroblock l = make_block(ly, lu, lv, y_width, 0, 0);
    macroblock r = make_block(ry, ru, rv, y_width, 0, 0);
    return compute_block_mad(l, r);
}

extern "C" int evxu_block_mean(short *y, unsigned int y_width) {
    macroblock b;
    b.data_y = y; b.data_u = 0; b.data_v = 0; b.stride = y_width;
    return compute_block_mean(b);
}

extern "C" int evxu_nonzero_block_mean(short *y, unsigned int y_width) {
    macroblock b;
    b.data_y = y; b.data_u = 0; b.data_v = 0; b.stride = y_width;
    return compute_nonzero_block_mean(b);
}

extern "C" int evxu_block_variance(short *y, unsigned int y_width) {
    macroblock b;
    b.data_y = y; b.data_u = 0; b.data_v = 0; b.stride = y_width;
    return compute_block_variance(b);
}

extern "C" int evxu_block_variance3(short *y, unsigned int y_width) {
    macroblock b;
    b.data_y = y; b.data_u = 0; b.data_v = 0; b.stride = y_width;
    return compute_block_variance3(b);
}
