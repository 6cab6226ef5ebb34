// Serial ABI shim for TBB 2018 (libtbb.so.2) — JUST enough to run the
// reference's prebuilt Vega `computeDistanceField` binary on this host for
// numerical cross-validation of native/distfield.cpp (the binary links the
// 2018 tbb::task ABI, which oneTBB 12 dropped; no network, no packages).
//
// This is a single-threaded reimplementation of the 26 dynamic symbols the
// binary imports (objdump -T | grep UND | grep tbb). It reproduces the
// 2018 ABI contracts the binary's INLINED header code depends on:
//   * tbb::internal::scheduler vtable order (spawn, wait_for_all,
//     spawn_root_and_wait, dtor, enqueue) — inlined task.h methods call
//     prefix().owner->slot directly;
//   * task_prefix layout (context/origin/owner/parent/ref_count/depth/
//     state/extra_state/affinity/next; the task object sits at prefix+1);
//   * task state machine (executing/reexecute/ready/allocated/freed/
//     recycle) incl. the recycle_as_*_continuation/child re-dispatch rules;
//   * concurrent_vector_base_v3 field order (vector_allocator_ptr,
//     my_first_block, my_early_size, my_segment, my_storage[3]) and the
//     segment math (segment_base(k) = (1<<k) & ~1) that the templated
//     subscript/iterator code inlines into the app.
//
// Execution model: one global LIFO task pool, depth-first run loop with
// scheduler-bypass, refcount-driven continuation resumption — the serial
// special case of TBB's work-stealing loop. Results are bit-identical to
// threaded TBB for the data-parallel algorithms Vega uses (parallel_for
// over independent slabs); only wall-clock differs.
//
// Validation harness only — the disn_tpu pipeline never loads this.
// Reference invocation: /root/reference/preprocessing/create_point_sdf_grid.py:200-210.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>
#include <vector>

#define SHIM_ABORT(msg)                                                    \
    do {                                                                   \
        std::fprintf(stderr, "[tbb-shim] FATAL: %s\n", msg);               \
        std::abort();                                                      \
    } while (0)

static bool shim_trace() {
    static int v = -1;
    if (v < 0) v = std::getenv("TBB_SHIM_TRACE") ? 1 : 0;
    return v;
}
#define SHIM_TRACE(...)                                                    \
    do {                                                                   \
        if (shim_trace()) std::fprintf(stderr, "[tbb-shim] " __VA_ARGS__); \
    } while (0)

namespace tbb {

class task;
class task_group_context;

namespace internal {

typedef intptr_t reference_count;
typedef unsigned short affinity_id;

class scheduler {
public:
    virtual void spawn(task& first, task*& next) = 0;
    virtual void wait_for_all(task& parent, task* child) = 0;
    virtual void spawn_root_and_wait(task& first, task*& next) = 0;
    virtual ~scheduler() {}
    virtual void enqueue(task& t, void* reserved) = 0;
};

struct task_prefix {
    task_group_context* context;
    scheduler* origin;
    scheduler* owner;  // union with next_offloaded in the real header
    tbb::task* parent;
    reference_count ref_count;  // atomics unnecessary: single thread
    int depth;
    unsigned char state;
    unsigned char extra_state;
    affinity_id affinity;
    tbb::task* next;
};

// ---- cache-aligned allocation (tbb_allocator.cpp contract) -------------
void* NFS_Allocate(size_t n_element, size_t element_size, void* /*hint*/) {
    size_t bytes = n_element * element_size;
    void* p = nullptr;
    if (posix_memalign(&p, 128, (bytes + 127) & ~size_t(127)))
        SHIM_ABORT("NFS_Allocate OOM");
    return p;
}
void NFS_Free(void* p) { free(p); }
void* allocate_via_handler_v3(size_t n) {
    void* p = malloc(n);
    if (!p) SHIM_ABORT("allocate_via_handler OOM");
    return p;
}
void deallocate_via_handler_v3(void* p) { free(p); }

size_t get_initial_auto_partitioner_divisor() {
    // serial: a divisor of 1 makes auto_partitioned ranges indivisible, so
    // bodies run over whole ranges with no task splitting
    return 1;
}

struct tbb_thread_id {
    uint64_t id;
};
tbb_thread_id thread_get_id_v3() { return tbb_thread_id{(uint64_t)pthread_self()}; }

}  // namespace internal
}  // namespace tbb

// ---- task / scheduler core ------------------------------------------------

namespace tbb {

// vtable order matches 2018 task.h: ~task, execute, note_affinity
class task {
public:
    enum state_type { executing, reexecute, ready, allocated, freed, recycle };
    virtual ~task() {}
    virtual task* execute() = 0;
    virtual void note_affinity(internal::affinity_id id);
    internal::task_prefix& prefix() {
        return reinterpret_cast<internal::task_prefix*>(this)[-1];
    }
    static task& self();
};

void task::note_affinity(internal::affinity_id) {}

namespace {  // shim machinery

thread_local task* g_current_task = nullptr;

internal::task_prefix& prefix_of(task& t) {
    return reinterpret_cast<internal::task_prefix*>(&t)[-1];
}

class SerialScheduler final : public internal::scheduler {
public:
    std::vector<task*> pool;  // LIFO

    task& allocate_task(size_t size, task* parent, task_group_context* ctx) {
        char* mem = (char*)internal::NFS_Allocate(
            1, sizeof(internal::task_prefix) + size, nullptr);
        auto* p = reinterpret_cast<internal::task_prefix*>(mem);
        p->context = ctx;
        p->origin = this;
        p->owner = this;
        p->parent = parent;
        p->ref_count = 0;
        p->depth = 0;
        p->state = task::allocated;
        p->extra_state = 0;
        p->affinity = 0;
        p->next = nullptr;
        return *reinterpret_cast<task*>(p + 1);
    }
    static void free_task(task& t) {
        internal::NFS_Free(&prefix_of(t));
    }

    void collect_list(task& first, task*& next_ref, std::vector<task*>& out) {
        // intrusive list: follow prefix().next until the slot whose ADDRESS
        // is &next_ref (task.h passes t.prefix().next for a single task)
        task* t = &first;
        for (;;) {
            out.push_back(t);
            internal::task_prefix& p = prefix_of(*t);
            if (&p.next == &next_ref) break;
            t = p.next;
            if (!t) break;  // defensively treat null as end of list
        }
    }

    // Depth-first execution with scheduler bypass and continuation resume —
    // the serial projection of TBB's local_wait_for_all task loop.
    void run_one(task* t) {
        while (t) {
            internal::task_prefix& p = prefix_of(*t);
            p.owner = this;
            p.state = task::executing;
            task* saved = g_current_task;
            g_current_task = t;
            task* bypass = t->execute();
            g_current_task = saved;

            task* resume = nullptr;
            switch (p.state) {
                case task::executing: {  // normal completion
                    task* parent = p.parent;
                    t->~task();
                    free_task(*t);
                    if (parent && --prefix_of(*parent).ref_count == 0)
                        resume = parent;
                    break;
                }
                case task::reexecute:  // recycle_to_reexecute
                    p.state = task::allocated;
                    pool.push_back(t);
                    break;
                case task::allocated:  // recycled as continuation/child
                    break;
                case task::recycle:  // recycle_as_safe_continuation: the
                    // task holds +1 of its own ref_count as a guard child
                    p.state = task::allocated;
                    if (--p.ref_count == 0) resume = t;
                    break;
                default:
                    SHIM_ABORT("task in unexpected post-execute state");
            }
            if (bypass && resume) pool.push_back(resume);
            t = bypass ? bypass : resume;
        }
    }

    void drain_until(internal::task_prefix& waiter) {
        while (waiter.ref_count > 1) {
            if (pool.empty())
                SHIM_ABORT("serial deadlock: waiter refcount > 1 with an "
                           "empty pool");
            task* t = pool.back();
            pool.pop_back();
            run_one(t);
        }
    }

    void spawn(task& first, task*& next) override {
        std::vector<task*> list;
        collect_list(first, next, list);
        // LIFO pool: push in reverse so list-order tasks run first
        for (auto it = list.rbegin(); it != list.rend(); ++it) {
            prefix_of(**it).state = task::ready;
            pool.push_back(*it);
        }
    }

    void wait_for_all(task& parent, task* child) override {
        if (child) run_one(child);
        drain_until(prefix_of(parent));
        prefix_of(parent).ref_count = 0;  // TBB resets after the wait
    }

    void spawn_root_and_wait(task& first, task*& next) override {
        std::vector<task*> roots;
        collect_list(first, next, roots);
        // local dummy waiter the roots report completion to
        alignas(128) char dummy_mem[sizeof(internal::task_prefix) +
                                    sizeof(void*)];
        auto* dp = reinterpret_cast<internal::task_prefix*>(dummy_mem);
        std::memset(dummy_mem, 0, sizeof(dummy_mem));
        dp->owner = this;
        dp->ref_count = (internal::reference_count)roots.size() + 1;
        task* dummy = reinterpret_cast<task*>(dp + 1);
        for (task* r : roots) prefix_of(*r).parent = dummy;
        for (size_t i = roots.size(); i > 1; --i) {
            prefix_of(*roots[i - 1]).state = task::ready;
            pool.push_back(roots[i - 1]);
        }
        run_one(roots[0]);
        drain_until(*dp);
    }

    void enqueue(task& t, void* /*reserved*/) override {
        prefix_of(t).state = task::ready;
        pool.push_back(&t);
    }
};

SerialScheduler g_sched;

}  // anonymous namespace

task& task::self() {
    if (!g_current_task) SHIM_ABORT("task::self() outside a task");
    return *g_current_task;
}

// ---- allocation proxies (task.cpp contracts) ------------------------------

namespace internal {

class allocate_root_with_context_proxy {
    task_group_context& my_context;  // matches the 2018 header layout

public:
    task& allocate(size_t size) const;
    void free(task& t) const;
};

task& allocate_root_with_context_proxy::allocate(size_t size) const {
    return g_sched.allocate_task(size, nullptr, &my_context);
}
void allocate_root_with_context_proxy::free(task& t) const {
    // called iff the user task constructor threw: storage only, no dtor
    SerialScheduler::free_task(t);
}

class allocate_continuation_proxy {  // `this` IS the requesting task
public:
    task& allocate(size_t size) const;
};
task& allocate_continuation_proxy::allocate(size_t size) const {
    task& t = *(task*)const_cast<allocate_continuation_proxy*>(this);
    task_prefix& p = prefix_of(t);
    task* parent = p.parent;
    p.parent = nullptr;  // the continuation adopts the parent link
    return g_sched.allocate_task(size, parent, p.context);
}

class allocate_child_proxy {  // `this` IS the requesting task
public:
    task& allocate(size_t size) const;
};
task& allocate_child_proxy::allocate(size_t size) const {
    task& t = *(task*)const_cast<allocate_child_proxy*>(this);
    return g_sched.allocate_task(size, &t, prefix_of(t).context);
}

}  // namespace internal

namespace interface5 {
namespace internal {
class task_base {
public:
    static void destroy(task& victim);
};
void task_base::destroy(task& victim) {
    task* parent = prefix_of(victim).parent;
    victim.~task();
    SerialScheduler::free_task(victim);
    if (parent) --prefix_of(*parent).ref_count;  // no resume (TBB contract)
}
}  // namespace internal
}  // namespace interface5

// ---- task_group_context ----------------------------------------------------
// The app allocates these on ITS stack with the real 128+ byte sizeof and
// inline-initializes only my_kind/my_version_and_traits before calling
// init(); everything else is touched through the out-of-line methods below,
// so only those two leading fields must line up.

class task_group_context {
public:
    uintptr_t my_kind;
    uintptr_t my_version_and_traits;
    uintptr_t my_cancellation_requested;

    void init();
    void reset();
    bool cancel_group_execution();
    bool is_group_execution_cancelled() const;
    ~task_group_context();
};

void task_group_context::init() { my_cancellation_requested = 0; }
void task_group_context::reset() { my_cancellation_requested = 0; }
bool task_group_context::cancel_group_execution() {
    bool first = !my_cancellation_requested;
    my_cancellation_requested = 1;
    return first;
}
bool task_group_context::is_group_execution_cancelled() const {
    return my_cancellation_requested != 0;
}
task_group_context::~task_group_context() {}

// ---- task_arena (interface7) ----------------------------------------------

namespace interface7 {
namespace internal {

class delegate_base {  // vtable: operator(), dtor — matches 2018 header
public:
    virtual void operator()() const = 0;
    virtual ~delegate_base() {}
};

class task_arena_base {
public:
    void internal_initialize();
    void internal_terminate();
    void internal_execute(delegate_base& d) const;
    static int internal_current_slot();
};

void task_arena_base::internal_initialize() { SHIM_TRACE("arena init\n"); }
void task_arena_base::internal_terminate() {}
void task_arena_base::internal_execute(delegate_base& d) const { d(); }
int task_arena_base::internal_current_slot() { return 0; }

}  // namespace internal
}  // namespace interface7

// ---- concurrent_vector_base_v3 ---------------------------------------------
// Field order and segment math must match the 2018 header exactly: the
// templated subscript/iterator code is inlined in the app and reads
// my_segment/my_storage directly. segment_base(k) = (1<<k) & ~1, so segment
// 0 holds 2 elements and segment k>=1 holds 2^k. The first allocation
// creates one contiguous block spanning segments [0, my_first_block) whose
// sub-pointers alias into it (freed once via table[0] by the inlined
// internal_free_segments).

namespace internal {

class concurrent_vector_base_v3 {
public:
    typedef size_t segment_index_t;
    typedef size_t size_type;
    struct segment_t {
        void* array;
    };
    static const segment_index_t pointers_per_short_table = 3;
    static const segment_index_t pointers_per_long_table = 64;

    void* (*vector_allocator_ptr)(concurrent_vector_base_v3&, size_t);
    size_type my_first_block;
    size_type my_early_size;
    segment_t* my_segment;
    segment_t my_storage[pointers_per_short_table];

    typedef void (*internal_array_op1)(void*, size_type);
    typedef void (*internal_array_op2)(void*, const void*, size_type);

    static segment_index_t segment_index_of(size_type index) {
        size_type i = index | 1;
        segment_index_t k = 0;
        while (i >>= 1) ++k;
        return k;
    }
    static size_type segment_base(segment_index_t k) {
        return (size_type(1) << k) & ~size_type(1);
    }
    static size_type segment_size(segment_index_t k) {
        return size_type(1) << k;  // segment 0 also gets 2 via base math
    }

    void sanity_check() const {
        if (my_early_size == 0 && my_segment != my_storage &&
            my_segment != nullptr)
            SHIM_ABORT("concurrent_vector layout mismatch: my_segment does "
                       "not point at the short table on an empty vector");
    }

    segment_index_t find_segment_end() const {
        segment_index_t k = 0;
        segment_index_t limit = (my_segment == my_storage)
                                    ? pointers_per_short_table
                                    : pointers_per_long_table;
        while (k < limit && my_segment[k].array) ++k;
        return k;
    }

    void enable_segments_to(size_type new_size, size_type element_size);

    size_type internal_capacity() const;
    size_type internal_grow_by(size_type delta, size_type element_size,
                               internal_array_op2 init, const void* src);
    size_type internal_clear(internal_array_op1 destroy);
    ~concurrent_vector_base_v3();
};

void concurrent_vector_base_v3::enable_segments_to(size_type new_size,
                                                   size_type element_size) {
    segment_index_t k_end = segment_index_of(new_size - 1) + 1;
    // move to the long table when the short one is outgrown
    if (k_end > pointers_per_short_table && my_segment == my_storage) {
        segment_t* table = (segment_t*)NFS_Allocate(
            pointers_per_long_table, sizeof(segment_t), nullptr);
        std::memset(table, 0, pointers_per_long_table * sizeof(segment_t));
        for (segment_index_t i = 0; i < pointers_per_short_table; ++i)
            table[i] = my_storage[i];
        my_segment = table;
    }
    if (!my_segment[0].array) {
        // first allocation: one contiguous block spanning [0, first_block)
        segment_index_t fb = k_end < 2 ? 2 : k_end;
        void* block = vector_allocator_ptr(*this, segment_base(fb));
        for (segment_index_t i = 0; i < fb; ++i)
            my_segment[i].array =
                (char*)block + segment_base(i) * element_size;
        my_first_block = fb;
    }
    for (segment_index_t k = my_first_block; k < k_end; ++k)
        if (!my_segment[k].array)
            my_segment[k].array = vector_allocator_ptr(*this, segment_size(k));
}

concurrent_vector_base_v3::size_type
concurrent_vector_base_v3::internal_capacity() const {
    return segment_base(find_segment_end());
}

concurrent_vector_base_v3::size_type concurrent_vector_base_v3::internal_grow_by(
    size_type delta, size_type element_size, internal_array_op2 init,
    const void* src) {
    sanity_check();
    size_type old = my_early_size;
    if (!delta) return old;
    size_type new_size = old + delta;
    enable_segments_to(new_size, element_size);
    // initialize per contiguous segment run
    size_type i = old;
    while (i < new_size) {
        segment_index_t k = segment_index_of(i);
        size_type base = segment_base(k);
        size_type seg_end = segment_base(k + 1);
        size_type n = (new_size < seg_end ? new_size : seg_end) - i;
        init((char*)my_segment[k].array + (i - base) * element_size, src, n);
        i += n;
    }
    my_early_size = new_size;
    return old;
}

concurrent_vector_base_v3::size_type
concurrent_vector_base_v3::internal_clear(internal_array_op1 destroy) {
    segment_index_t k_end = find_segment_end();
    size_type finish = my_early_size;
    my_early_size = 0;
    while (finish > 0) {
        segment_index_t k = segment_index_of(finish - 1);
        size_type base = segment_base(k);
        destroy(my_segment[k].array, finish - base);
        finish = base;
    }
    return k_end;  // segment count for the inlined internal_free_segments
}

concurrent_vector_base_v3::~concurrent_vector_base_v3() {
    if (my_segment && my_segment != my_storage) NFS_Free(my_segment);
}

}  // namespace internal
}  // namespace tbb
