// Standalone native test for libvqadata: exercises store assembly and the
// concurrent prefetch loader (ring-slot protocol with v/b ownership
// rotation). Built by `make test` (and `make tsan_test` for the
// ThreadSanitizer build).

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
void* vqadata_store_create(const float*, const float*, const int64_t*,
                           int64_t, int64_t, int64_t, int64_t);
void vqadata_store_destroy(void*);
void vqadata_assemble(void*, const int64_t*, int64_t, int64_t, float*, float*,
                      uint8_t*, int64_t);
void* vqadata_loader_create(void*, const int64_t*, int64_t, int64_t, int64_t,
                            int, int64_t);
void vqadata_loader_push_order(void*, const int64_t*, int64_t);
void vqadata_loader_register_slot(void*, float*, float*, uint8_t*, int64_t*);
void vqadata_loader_swap_vb(void*, int64_t, float*, float*);
int64_t vqadata_loader_next(void*, int64_t, int64_t*);
void vqadata_loader_destroy(void*);
void vqadata_loader_set_quantize(void*, int);
void vqadata_loader_register_slot_q8(void*, int8_t*, float*, float*, uint8_t*,
                                     int64_t*);
void vqadata_loader_swap_vq8(void*, int64_t, int8_t*, float*, float*);
void vqadata_assemble_q8(void*, const int64_t*, int64_t, int64_t, int8_t*,
                         float*, float*, uint8_t*, int64_t);
void* vqadata_store_create_q8(const int8_t*, const float*, const float*,
                              const int64_t*, int64_t, int64_t, int64_t,
                              int64_t);
}

int main() {
  const int64_t n_images = 6, v_dim = 8, s_dim = 4, max_boxes = 5;
  // adaptive layout: images with 2..4 boxes
  std::vector<int64_t> pos = {0, 2, 2, 5, 5, 9, 9, 11, 11, 15, 15, 18};
  const int64_t total = 18;
  std::vector<float> feats(total * v_dim), spats(total * s_dim);
  for (size_t i = 0; i < feats.size(); ++i) feats[i] = static_cast<float>(i);
  for (size_t i = 0; i < spats.size(); ++i) spats[i] = static_cast<float>(i) * 0.5f;

  void* store = vqadata_store_create(feats.data(), spats.data(), pos.data(),
                                     n_images, 0, v_dim, s_dim);

  // synchronous assemble, multithreaded
  std::vector<int64_t> idx = {0, 3, 5, 1};
  std::vector<float> out_v(idx.size() * max_boxes * v_dim);
  std::vector<float> out_b(idx.size() * max_boxes * s_dim);
  std::vector<uint8_t> out_m(idx.size() * max_boxes);
  vqadata_assemble(store, idx.data(), idx.size(), max_boxes, out_v.data(),
                   out_b.data(), out_m.data(), 4);
  // image 0 has boxes [0,2): first feature value is 0, mask = 1,1,0,0,0
  assert(out_v[0] == 0.0f);
  assert(out_m[0] == 1 && out_m[1] == 1 && out_m[2] == 0);
  // image 3 has boxes [9,11): first feature value is 9*v_dim
  assert(out_v[max_boxes * v_dim] == 9.0f * v_dim);

  // concurrent prefetch loader: host-pushed epoch orders, 3 registered ring
  // slots, v/b buffers rotated out before each recycle (the Python side's
  // zero-copy ownership contract)
  std::vector<int64_t> row_to_image = {0, 1, 2, 3, 4, 5, 0, 1};
  const int64_t n_rows = static_cast<int64_t>(row_to_image.size());
  const int64_t bs = 3;
  void* loader = vqadata_loader_create(store, row_to_image.data(), n_rows, bs,
                                       max_boxes, /*drop_last=*/0,
                                       /*assemble_threads=*/2);

  const int64_t kSlots = 3;
  const size_t v_sz = bs * max_boxes * v_dim, b_sz = bs * max_boxes * s_dim;
  // generous buffer arena: initial slots + one fresh pair per consumed batch
  std::vector<std::vector<float>> v_bufs, b_bufs;
  std::vector<std::vector<uint8_t>> m_bufs(kSlots,
                                           std::vector<uint8_t>(bs * max_boxes));
  std::vector<std::vector<int64_t>> i_bufs(kSlots, std::vector<int64_t>(bs));
  std::vector<int64_t> slot_vbuf(kSlots);  // which v/b pair each slot holds
  for (int64_t s = 0; s < kSlots; ++s) {
    v_bufs.emplace_back(v_sz);
    b_bufs.emplace_back(b_sz);
    slot_vbuf[s] = s;
    vqadata_loader_register_slot(loader, v_bufs[s].data(), b_bufs[s].data(),
                                 m_bufs[s].data(), i_bufs[s].data());
  }

  const int epochs = 2;
  const int64_t batches_per_epoch = (n_rows + bs - 1) / bs;
  std::vector<int64_t> order(n_rows);
  for (int64_t i = 0; i < n_rows; ++i) order[i] = n_rows - 1 - i;  // reversed

  int64_t held = -1, seen = 0;
  struct Held {  // the batch the consumer is still "using"
    const float* v = nullptr;
    float first = 0.0f;
  } prev_batch;
  for (int e = 0; e < epochs; ++e) {
    vqadata_loader_push_order(loader, order.data(), n_rows);
    for (int64_t batch = 0; batch < batches_per_epoch; ++batch) {
      if (held >= 0) {
        // ownership rotation: swap a FRESH v/b pair into the held slot
        // before recycling it, so the previously yielded buffers are never
        // rewritten (they may still be aliased by a zero-copy consumer)
        v_bufs.emplace_back(v_sz);
        b_bufs.emplace_back(b_sz);
        const int64_t nb = static_cast<int64_t>(v_bufs.size()) - 1;
        vqadata_loader_swap_vb(loader, held, v_bufs[nb].data(),
                               b_bufs[nb].data());
        slot_vbuf[held] = nb;
      }
      int64_t rows = 0;
      const int64_t slot = vqadata_loader_next(loader, held, &rows);
      assert(slot >= 0 && slot < kSlots);
      held = slot;
      assert(rows > 0 && rows <= bs);
      const float* v = v_bufs[slot_vbuf[slot]].data();
      const uint8_t* m = m_bufs[slot].data();
      const int64_t* li = i_bufs[slot].data();
      for (int64_t r = 0; r < rows; ++r) {
        assert(li[r] >= 0 && li[r] < n_rows);
        // at least one real box in every row, and the row's first feature
        // matches a direct store lookup
        assert(m[r * max_boxes] == 1);
        const int64_t img = row_to_image[li[r]];
        const int64_t start = pos[2 * img];
        assert(v[r * max_boxes * v_dim] == feats[start * v_dim]);
      }
      if (prev_batch.v != nullptr) {
        // the batch yielded LAST iteration must be untouched even though
        // its slot has been recycled (rotation contract)
        assert(prev_batch.v[0] == prev_batch.first);
      }
      prev_batch.v = v;
      prev_batch.first = v[0];
      seen += rows;
    }
  }
  assert(seen == epochs * n_rows);
  vqadata_loader_destroy(loader);

  // int8 quantize-on-assembly: the synchronous entry must match the
  // quantize_v contract (scale = absmax/127, q = rint(v/scale); padded
  // boxes q=0 / scale=1), and the q8 loader must yield the same bytes.
  std::vector<int8_t> q_v(idx.size() * max_boxes * v_dim);
  std::vector<float> q_s(idx.size() * max_boxes);
  std::vector<float> q_b(idx.size() * max_boxes * s_dim);
  std::vector<uint8_t> q_m(idx.size() * max_boxes);
  vqadata_assemble_q8(store, idx.data(), idx.size(), max_boxes, q_v.data(),
                      q_s.data(), q_b.data(), q_m.data(), 2);
  for (size_t r = 0; r < idx.size(); ++r) {
    const int64_t img = idx[r];
    const int64_t start = pos[2 * img];
    const int64_t count = pos[2 * img + 1] - start;
    for (int64_t box = 0; box < max_boxes; ++box) {
      const int8_t* qrow = q_v.data() + (r * max_boxes + box) * v_dim;
      const float scale = q_s[r * max_boxes + box];
      if (box >= count) {  // padding: exact zeros, unit scale
        assert(scale == 1.0f);
        for (int64_t k = 0; k < v_dim; ++k) assert(qrow[k] == 0);
        continue;
      }
      const float* src = feats.data() + (start + box) * v_dim;
      float amax = 0.0f;
      for (int64_t k = 0; k < v_dim; ++k)
        amax = std::max(amax, std::abs(src[k]));
      const float want = amax > 0.0f ? amax / 127.0f : 1.0f;
      assert(scale == want);
      for (int64_t k = 0; k < v_dim; ++k) {
        const float deq = static_cast<float>(qrow[k]) * scale;
        assert(std::abs(deq - src[k]) <= 0.5f * scale + 1e-6f);
      }
    }
    // spatials and mask ride along exactly as the f32 assembly emits them
    assert(std::memcmp(q_b.data() + r * max_boxes * s_dim,
                       out_b.data() + r * max_boxes * s_dim,
                       max_boxes * s_dim * sizeof(float)) == 0);
    assert(std::memcmp(q_m.data() + r * max_boxes,
                       out_m.data() + r * max_boxes, max_boxes) == 0);
  }

  // q8 prefetch loader: one epoch, sequential order; bytes must equal the
  // synchronous q8 assembly of the same rows
  void* qloader = vqadata_loader_create(store, row_to_image.data(), n_rows,
                                        bs, max_boxes, /*drop_last=*/0,
                                        /*assemble_threads=*/2);
  vqadata_loader_set_quantize(qloader, 1);
  std::vector<std::vector<int8_t>> qv_bufs;
  std::vector<std::vector<float>> qs_bufs, qb_bufs;
  std::vector<std::vector<uint8_t>> qm_bufs(
      kSlots, std::vector<uint8_t>(bs * max_boxes));
  std::vector<std::vector<int64_t>> qi_bufs(kSlots, std::vector<int64_t>(bs));
  std::vector<int64_t> qslot_buf(kSlots);
  for (int64_t s = 0; s < kSlots; ++s) {
    qv_bufs.emplace_back(v_sz);
    qs_bufs.emplace_back(bs * max_boxes);
    qb_bufs.emplace_back(b_sz);
    qslot_buf[s] = s;
    vqadata_loader_register_slot_q8(qloader, qv_bufs[s].data(),
                                    qs_bufs[s].data(), qb_bufs[s].data(),
                                    qm_bufs[s].data(), qi_bufs[s].data());
  }
  std::vector<int64_t> seq(n_rows);
  for (int64_t i = 0; i < n_rows; ++i) seq[i] = i;
  vqadata_loader_push_order(qloader, seq.data(), n_rows);
  held = -1;
  for (int64_t batch = 0; batch < batches_per_epoch; ++batch) {
    if (held >= 0) {
      qv_bufs.emplace_back(v_sz);
      qs_bufs.emplace_back(bs * max_boxes);
      qb_bufs.emplace_back(b_sz);
      const int64_t nb = static_cast<int64_t>(qv_bufs.size()) - 1;
      vqadata_loader_swap_vq8(qloader, held, qv_bufs[nb].data(),
                              qs_bufs[nb].data(), qb_bufs[nb].data());
      qslot_buf[held] = nb;
    }
    int64_t rows = 0;
    const int64_t slot = vqadata_loader_next(qloader, held, &rows);
    assert(slot >= 0 && slot < kSlots);
    held = slot;
    // reference: synchronous q8 assembly of the same image rows
    std::vector<int64_t> imgs(rows);
    for (int64_t r = 0; r < rows; ++r)
      imgs[r] = row_to_image[qi_bufs[slot][r]];
    std::vector<int8_t> ref_v(rows * max_boxes * v_dim);
    std::vector<float> ref_s(rows * max_boxes), ref_b(rows * max_boxes * s_dim);
    std::vector<uint8_t> ref_m(rows * max_boxes);
    vqadata_assemble_q8(store, imgs.data(), rows, max_boxes, ref_v.data(),
                        ref_s.data(), ref_b.data(), ref_m.data(), 1);
    assert(std::memcmp(qv_bufs[qslot_buf[slot]].data(), ref_v.data(),
                       ref_v.size()) == 0);
    assert(std::memcmp(qs_bufs[qslot_buf[slot]].data(), ref_s.data(),
                       ref_s.size() * sizeof(float)) == 0);
    assert(std::memcmp(qb_bufs[qslot_buf[slot]].data(), ref_b.data(),
                       ref_b.size() * sizeof(float)) == 0);
    assert(std::memcmp(qm_bufs[slot].data(), ref_m.data(), ref_m.size()) == 0);
  }
  vqadata_loader_destroy(qloader);

  // int8-RESIDENT store (FeatureStore.quantized): quantize the raw rows
  // host-side, register via store_create_q8, and check both assembly
  // flavors: q8 assembly must memcpy the resident bytes verbatim, f32
  // assembly must dequantize exactly (q * scale).
  std::vector<int8_t> res_q(total * v_dim);
  std::vector<float> res_s(total);
  for (int64_t r = 0; r < total; ++r) {
    float amax = 0.0f;
    for (int64_t k = 0; k < v_dim; ++k)
      amax = std::max(amax, std::abs(feats[r * v_dim + k]));
    const float sc = amax > 0.0f ? amax / 127.0f : 1.0f;
    res_s[r] = sc;
    for (int64_t k = 0; k < v_dim; ++k)
      res_q[r * v_dim + k] =
          static_cast<int8_t>(std::lrint(feats[r * v_dim + k] / sc));
  }
  void* qstore = vqadata_store_create_q8(res_q.data(), res_s.data(),
                                         spats.data(), pos.data(), n_images,
                                         0, v_dim, s_dim);
  // q8 assembly == resident bytes
  std::vector<int8_t> rq_v(idx.size() * max_boxes * v_dim);
  std::vector<float> rq_s(idx.size() * max_boxes);
  std::vector<float> rq_b(idx.size() * max_boxes * s_dim);
  std::vector<uint8_t> rq_m(idx.size() * max_boxes);
  vqadata_assemble_q8(qstore, idx.data(), idx.size(), max_boxes, rq_v.data(),
                      rq_s.data(), rq_b.data(), rq_m.data(), 2);
  for (size_t r = 0; r < idx.size(); ++r) {
    const int64_t start = pos[2 * idx[r]];
    const int64_t count =
        std::min<int64_t>(pos[2 * idx[r] + 1] - start, max_boxes);
    assert(std::memcmp(rq_v.data() + r * max_boxes * v_dim,
                       res_q.data() + start * v_dim, count * v_dim) == 0);
    assert(std::memcmp(rq_s.data() + r * max_boxes, res_s.data() + start,
                       count * sizeof(float)) == 0);
    assert(std::memcmp(rq_m.data() + r * max_boxes,
                       out_m.data() + r * max_boxes, max_boxes) == 0);
  }
  // f32 assembly == exact dequantization
  std::vector<float> rf_v(idx.size() * max_boxes * v_dim);
  std::vector<float> rf_b(idx.size() * max_boxes * s_dim);
  std::vector<uint8_t> rf_m(idx.size() * max_boxes);
  vqadata_assemble(qstore, idx.data(), idx.size(), max_boxes, rf_v.data(),
                   rf_b.data(), rf_m.data(), 2);
  for (size_t r = 0; r < idx.size(); ++r) {
    const int64_t start = pos[2 * idx[r]];
    const int64_t count =
        std::min<int64_t>(pos[2 * idx[r] + 1] - start, max_boxes);
    for (int64_t box = 0; box < count; ++box) {
      for (int64_t k = 0; k < v_dim; ++k) {
        const float want =
            static_cast<float>(res_q[(start + box) * v_dim + k]) *
            res_s[start + box];
        assert(rf_v[(r * max_boxes + box) * v_dim + k] == want);
      }
    }
  }
  vqadata_store_destroy(qstore);
  vqadata_store_destroy(store);
  std::printf("vqadata_test: OK\n");
  return 0;
}
