// Continuous-batching scheduler: the native runtime brain for the serving
// engine (easykv_tpu/serving). Python executes the compiled TPU steps; this
// library decides, each engine tick, which requests prefill (chunked, under
// a per-tick token budget), which decode, and how batch slots are assigned
// and recycled. Pure C++17, no dependencies; bound via ctypes
// (easykv_tpu/native/scheduler.py).
//
// Policy:
//   * FIFO within priority class (higher priority value first);
//   * a request occupies a slot from admission to completion;
//   * per tick, at most `max_prefill_tokens` prompt tokens are scheduled
//     across admitted-but-unprefilled requests (vLLM-style chunked prefill),
//     decode continues for every fully-prefilled request in the same tick;
//   * completion (EOS or max_new_tokens) frees the slot immediately.

#include <algorithm>
#include <cstdint>
#include <deque>
#include <unordered_map>
#include <vector>

namespace {

enum ActionKind : int32_t {
  kPrefillChunk = 0,
  kDecode = 1,
};

struct Action {
  int32_t kind;
  int64_t request_id;
  int32_t slot;
  int32_t chunk_start;
  int32_t chunk_len;
};

struct Request {
  int64_t id;
  int32_t prompt_len;
  int32_t max_new_tokens;
  int32_t priority;
  int64_t seq;             // admission order tiebreak
  int32_t slot = -1;
  int32_t prefilled = 0;   // prompt tokens consumed so far
  int32_t generated = 0;
  bool done = false;
};

struct Scheduler {
  int32_t n_slots;
  int32_t max_prefill_tokens;
  int32_t chunk_cap;           // per-request per-tick prefill cap
  int64_t next_seq = 0;
  std::vector<int64_t> slot_owner;              // -1 = free
  std::unordered_map<int64_t, Request> requests;
  std::deque<int64_t> waiting;                  // not yet slotted

  explicit Scheduler(int32_t slots, int32_t max_prefill, int32_t chunk)
      : n_slots(slots), max_prefill_tokens(max_prefill),
        chunk_cap(chunk > 0 ? chunk : max_prefill), slot_owner(slots, -1) {}

  int free_slot() const {
    for (int i = 0; i < n_slots; i++)
      if (slot_owner[i] < 0) return i;
    return -1;
  }

  void admit_waiting() {
    // stable priority order: higher priority first, then FIFO
    std::vector<int64_t> order(waiting.begin(), waiting.end());
    std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
      const Request& ra = requests.at(a);
      const Request& rb = requests.at(b);
      if (ra.priority != rb.priority) return ra.priority > rb.priority;
      return ra.seq < rb.seq;
    });
    std::deque<int64_t> rest;
    for (int64_t id : order) {
      int slot = free_slot();
      if (slot < 0) {
        rest.push_back(id);
        continue;
      }
      slot_owner[slot] = id;
      requests.at(id).slot = slot;
    }
    waiting = std::move(rest);
  }

  int plan(Action* out, int cap) {
    admit_waiting();
    int n = 0;
    int32_t prefill_budget = max_prefill_tokens;
    // prefill chunks: slotted requests that still have prompt left,
    // priority-then-FIFO order
    std::vector<const Request*> slotted;
    for (auto& kv : requests) {
      const Request& r = kv.second;
      if (!r.done && r.slot >= 0) slotted.push_back(&r);
    }
    std::stable_sort(slotted.begin(), slotted.end(),
                     [](const Request* a, const Request* b) {
                       if (a->priority != b->priority)
                         return a->priority > b->priority;
                       return a->seq < b->seq;
                     });
    for (const Request* r : slotted) {
      if (n >= cap || prefill_budget <= 0) break;
      if (r->prefilled < r->prompt_len) {
        int32_t len = std::min(std::min(prefill_budget, chunk_cap),
                               r->prompt_len - r->prefilled);
        out[n++] = Action{kPrefillChunk, r->id, r->slot, r->prefilled, len};
        prefill_budget -= len;
      }
    }
    // decode: every fully-prefilled live request
    for (const Request* r : slotted) {
      if (n >= cap) break;
      if (r->prefilled >= r->prompt_len)
        out[n++] = Action{kDecode, r->id, r->slot, 0, 1};
    }
    return n;
  }
};

}  // namespace

extern "C" {

// chunk_cap: per-request per-tick prefill cap (<=0 means max_prefill_tokens).
// The total budget still bounds the tick; with chunk_cap == the compiled
// chunk width, several requests can prefill one chunk each in a single tick.
void* sched_create(int32_t n_slots, int32_t max_prefill_tokens,
                   int32_t chunk_cap) {
  return new Scheduler(n_slots, max_prefill_tokens, chunk_cap);
}

void sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

int32_t sched_submit(void* h, int64_t request_id, int32_t prompt_len,
                     int32_t max_new_tokens, int32_t priority) {
  Scheduler* s = static_cast<Scheduler*>(h);
  if (s->requests.count(request_id)) return -1;
  Request r;
  r.id = request_id;
  r.prompt_len = prompt_len;
  r.max_new_tokens = max_new_tokens;
  r.priority = priority;
  r.seq = s->next_seq++;
  s->requests.emplace(request_id, r);
  s->waiting.push_back(request_id);
  return 0;
}

// Fills `out` (see Action layout: 5 fields, i32/i64/i32/i32/i32) and returns
// the number of actions planned for this tick.
int32_t sched_plan(void* h, Action* out, int32_t cap) {
  return static_cast<Scheduler*>(h)->plan(out, cap);
}

// Report progress. kind 0 = prefill chunk done (len tokens); kind 1 = one
// token generated (is_eos ends the request). Returns 1 if the request
// completed (slot freed), else 0.
int32_t sched_report(void* h, int64_t request_id, int32_t kind, int32_t len,
                     int32_t is_eos) {
  Scheduler* s = static_cast<Scheduler*>(h);
  auto it = s->requests.find(request_id);
  if (it == s->requests.end()) return -1;
  Request& r = it->second;
  if (kind == 0) {
    r.prefilled += len;
    return 0;
  }
  r.generated += len;
  if (is_eos || r.generated >= r.max_new_tokens) {
    r.done = true;
    if (r.slot >= 0) s->slot_owner[r.slot] = -1;
    s->requests.erase(it);
    return 1;
  }
  return 0;
}

int32_t sched_slot_of(void* h, int64_t request_id) {
  Scheduler* s = static_cast<Scheduler*>(h);
  auto it = s->requests.find(request_id);
  return it == s->requests.end() ? -1 : it->second.slot;
}

// Snapshot every live request (slotted and waiting) in admission (seq)
// order: ids[i] and 6 fields per row {slot(-1 = waiting), prompt_len,
// max_new_tokens, prefilled, generated, priority}. Returns the row count.
// Re-submitting the rows through sched_restore in this order reproduces the
// scheduler state exactly (seq is re-issued monotonically on restore).
int32_t sched_dump(void* h, int64_t* ids, int32_t* fields, int32_t cap) {
  Scheduler* s = static_cast<Scheduler*>(h);
  std::vector<const Request*> rows;
  rows.reserve(s->requests.size());
  for (auto& kv : s->requests) rows.push_back(&kv.second);
  std::sort(rows.begin(), rows.end(),
            [](const Request* a, const Request* b) { return a->seq < b->seq; });
  int32_t n = 0;
  for (const Request* r : rows) {
    if (n >= cap) break;
    ids[n] = r->id;
    int32_t* f = fields + 6 * n;
    f[0] = r->slot;
    f[1] = r->prompt_len;
    f[2] = r->max_new_tokens;
    f[3] = r->prefilled;
    f[4] = r->generated;
    f[5] = r->priority;
    n++;
  }
  return n;
}

// Restore one dumped row (crash-recovery path). slot >= 0 pins the request
// back into its batch slot; slot < 0 re-queues it as waiting.
int32_t sched_restore(void* h, int64_t id, int32_t slot, int32_t prompt_len,
                      int32_t max_new_tokens, int32_t prefilled,
                      int32_t generated, int32_t priority) {
  Scheduler* s = static_cast<Scheduler*>(h);
  if (s->requests.count(id)) return -1;
  if (slot >= 0 && (slot >= s->n_slots || s->slot_owner[slot] >= 0)) return -2;
  Request r;
  r.id = id;
  r.prompt_len = prompt_len;
  r.max_new_tokens = max_new_tokens;
  r.priority = priority;
  r.seq = s->next_seq++;
  r.slot = slot;
  r.prefilled = prefilled;
  r.generated = generated;
  s->requests.emplace(id, r);
  if (slot >= 0) {
    s->slot_owner[slot] = id;
  } else {
    s->waiting.push_back(id);
  }
  return 0;
}

int32_t sched_num_waiting(void* h) {
  return static_cast<int32_t>(static_cast<Scheduler*>(h)->waiting.size());
}

int32_t sched_num_active(void* h) {
  Scheduler* s = static_cast<Scheduler*>(h);
  int32_t n = 0;
  for (int64_t owner : s->slot_owner)
    if (owner >= 0) n++;
  return n;
}

}  // extern "C"
