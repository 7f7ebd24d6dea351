// whisper_tpu native GBNF grammar engine.
//
// C++ implementation of the pushdown-automaton token filter with the same
// semantics as whisper_tpu/grammar.py (which is the Python reference,
// tested against whisper.cpp's behavior).  The per-token cost of the
// Python engine (~0.25 s over a 51k vocab) drops to milliseconds here,
// matching the reference's native grammar performance.
//
// Exposed with a plain C ABI for ctypes; handles are opaque pointers.
//
// Element encoding (same ids as whisper_tpu/grammar.py / whisper.h):
//   END=0 ALT=1 RULE_REF=2 CHAR=3 CHAR_NOT=4 CHAR_RNG_UPPER=5 CHAR_ALT=6

#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <set>
#include <string>
#include <vector>

namespace {

enum ElemType : uint32_t {
    END = 0, ALT = 1, RULE_REF = 2, CHAR = 3, CHAR_NOT = 4,
    CHAR_RNG_UPPER = 5, CHAR_ALT = 6,
};

struct Elem {
    uint32_t type;
    uint32_t value;
};

struct PartialUtf8 {
    uint32_t value = 0;
    int n_remain = 0;
};

// a stack entry points into rules[rule_id] at position pos
struct Ref {
    int32_t rule = 0;
    int32_t pos = 0;
    bool operator<(const Ref & o) const {
        return rule != o.rule ? rule < o.rule : pos < o.pos;
    }
    bool operator==(const Ref & o) const {
        return rule == o.rule && pos == o.pos;
    }
};

using Stack = std::vector<Ref>;

struct TokenInfo {
    std::vector<uint32_t> code_points;   // 0-terminated (clean-state cache)
    std::string bytes;
    bool skip = false;                   // "[_...]" specials
};

struct Vocab {
    std::vector<TokenInfo> tokens;       // ids [0, token_eot)
    int token_eot = 0;
    // first-code-point buckets (clean-partial fast path): tokens whose
    // first cp can't start any stack's next char are rejected wholesale
    // without running the pushdown matcher.  Key 0 collects odd tokens
    // (empty decode) that must always take the slow path.
    std::vector<std::pair<uint32_t, std::vector<int32_t>>> buckets;
};

struct Grammar {
    std::shared_ptr<std::vector<std::vector<Elem>>> rules;
    std::shared_ptr<Vocab> vocab;
    std::vector<Stack> stacks;
    PartialUtf8 partial;
};

bool is_end(const Elem & e) { return e.type == END || e.type == ALT; }

std::pair<bool, int> match_char(const std::vector<Elem> & rule, int pos,
                                uint32_t chr) {
    bool found = false;
    const bool positive = rule[pos].type == CHAR;
    while (true) {
        if (pos + 1 < (int) rule.size()
                && rule[pos + 1].type == CHAR_RNG_UPPER) {
            found = found || (rule[pos].value <= chr
                              && chr <= rule[pos + 1].value);
            pos += 2;
        } else {
            found = found || rule[pos].value == chr;
            pos += 1;
        }
        if (pos >= (int) rule.size() || rule[pos].type != CHAR_ALT) break;
    }
    return {found == positive, pos};
}

bool match_partial_char(const std::vector<Elem> & rule, int pos,
                        const PartialUtf8 & partial) {
    const bool positive = rule[pos].type == CHAR;
    uint32_t value = partial.value;
    int n_remain = partial.n_remain;
    if (n_remain < 0 || (n_remain == 1 && value < 2)) return false;
    uint32_t low = value << (n_remain * 6);
    uint32_t high = low | ((1u << (n_remain * 6)) - 1);
    if (low == 0) {
        if (n_remain == 2) low = 1u << 11;
        else if (n_remain == 3) low = 1u << 16;
    }
    while (true) {
        if (pos + 1 < (int) rule.size()
                && rule[pos + 1].type == CHAR_RNG_UPPER) {
            if (rule[pos].value <= high && low <= rule[pos + 1].value)
                return positive;
            pos += 2;
        } else {
            if (low <= rule[pos].value && rule[pos].value <= high)
                return positive;
            pos += 1;
        }
        if (pos >= (int) rule.size() || rule[pos].type != CHAR_ALT) break;
    }
    return !positive;
}

void advance_stack(const std::vector<std::vector<Elem>> & rules,
                   const Stack & stack, std::vector<Stack> & out) {
    if (stack.empty()) {
        out.push_back(stack);
        return;
    }
    const Ref top = stack.back();
    const Elem & e = rules[top.rule][top.pos];
    if (e.type == RULE_REF) {
        const int sub = (int) e.value;
        int subpos = 0;
        while (true) {
            Stack ns(stack.begin(), stack.end() - 1);
            const Elem & nxt = rules[top.rule][top.pos + 1];
            if (!is_end(nxt)) ns.push_back({top.rule, top.pos + 1});
            if (!is_end(rules[sub][subpos])) ns.push_back({sub, subpos});
            advance_stack(rules, ns, out);
            while (!is_end(rules[sub][subpos])) subpos++;
            if (rules[sub][subpos].type == ALT) subpos++;
            else break;
        }
    } else {  // CHAR / CHAR_NOT
        out.push_back(stack);
    }
}

struct Candidate {
    int32_t id;
    const uint32_t * cp;   // remaining code points (0-terminated)
    PartialUtf8 partial;
};

void reject_candidates(const std::vector<std::vector<Elem>> & rules,
                       const std::vector<Stack> & stacks,
                       const std::vector<Candidate> & cands,
                       std::vector<Candidate> & rejects);

void reject_for_stack(const std::vector<std::vector<Elem>> & rules,
                      const Stack & stack,
                      const std::vector<Candidate> & cands,
                      std::vector<Candidate> & rejects) {
    if (stack.empty()) {
        for (const auto & c : cands) {
            if (*c.cp != 0 || c.partial.n_remain != 0) rejects.push_back(c);
        }
        return;
    }
    const Ref top = stack.back();
    const auto & rule = rules[top.rule];

    std::vector<Candidate> next;
    for (const auto & c : cands) {
        if (*c.cp == 0) {
            if (c.partial.n_remain != 0
                    && !match_partial_char(rule, top.pos, c.partial)) {
                rejects.push_back(c);
            }
        } else if (match_char(rule, top.pos, *c.cp).first) {
            next.push_back({c.id, c.cp + 1, c.partial});
        } else {
            rejects.push_back(c);
        }
    }
    if (next.empty()) return;

    const int after = match_char(rule, top.pos, 0).second;
    Stack stack_after(stack.begin(), stack.end() - 1);
    if (after < (int) rule.size() && !is_end(rule[after])) {
        stack_after.push_back({top.rule, after});
    }
    std::vector<Stack> next_stacks;
    advance_stack(rules, stack_after, next_stacks);

    std::vector<Candidate> next_rejects;
    reject_candidates(rules, next_stacks, next, next_rejects);
    for (const auto & c : next_rejects) {
        rejects.push_back({c.id, c.cp - 1, c.partial});
    }
}

void reject_candidates(const std::vector<std::vector<Elem>> & rules,
                       const std::vector<Stack> & stacks,
                       const std::vector<Candidate> & cands,
                       std::vector<Candidate> & rejects) {
    if (cands.empty() || stacks.empty()) return;
    std::vector<Candidate> cur;
    reject_for_stack(rules, stacks[0], cands, cur);
    for (size_t i = 1; i < stacks.size(); ++i) {
        std::vector<Candidate> nxt;
        reject_for_stack(rules, stacks[i], cur, nxt);
        cur.swap(nxt);
    }
    rejects.swap(cur);
}

std::pair<std::vector<uint32_t>, PartialUtf8> decode_utf8(
        const std::string & data, PartialUtf8 partial) {
    static const int lookup[16] = {1,1,1,1,1,1,1,1,0,0,0,0,2,2,3,4};
    size_t pos = 0;
    std::vector<uint32_t> cps;
    uint32_t value = partial.value;
    int n_remain = partial.n_remain;

    while (pos < data.size() && n_remain > 0) {
        const uint8_t b = (uint8_t) data[pos];
        if ((b >> 6) != 2) {
            return {{0}, {0, -1}};
        }
        value = (value << 6) + (b & 0x3F);
        pos++;
        n_remain--;
    }
    if (partial.n_remain > 0 && n_remain == 0) cps.push_back(value);

    while (pos < data.size()) {
        const uint8_t first = (uint8_t) data[pos];
        n_remain = lookup[first >> 4] - 1;
        if (n_remain < 0) {
            return {{0}, {0, n_remain}};
        }
        const uint8_t mask = (1u << (7 - n_remain)) - 1;
        value = first & mask;
        pos++;
        while (pos < data.size() && n_remain > 0) {
            value = (value << 6) + ((uint8_t) data[pos] & 0x3F);
            pos++;
            n_remain--;
        }
        if (n_remain == 0) cps.push_back(value);
    }
    cps.push_back(0);
    return {cps, {value, n_remain}};
}

void dedup_stacks(std::vector<Stack> & stacks) {
    std::set<Stack> seen;
    std::vector<Stack> out;
    for (auto & s : stacks) {
        if (seen.insert(s).second) out.push_back(std::move(s));
    }
    stacks.swap(out);
}

}  // namespace

extern "C" {

// elements: flat (type, value) pairs; rule r spans
// [rule_offsets[r], rule_offsets[r+1]) and must end with END.
void * wtpu_grammar_init(const uint32_t * types, const uint32_t * values,
                         int n_elems, const int32_t * rule_offsets,
                         int n_rules, int start_rule) {
    auto * g = new Grammar();
    g->rules = std::make_shared<std::vector<std::vector<Elem>>>(n_rules);
    for (int r = 0; r < n_rules; ++r) {
        auto & rule = (*g->rules)[r];
        for (int i = rule_offsets[r]; i < rule_offsets[r + 1]; ++i) {
            rule.push_back({types[i], values[i]});
        }
    }
    // initial stacks from the start rule's alternates
    const auto & rule = (*g->rules)[start_rule];
    int pos = 0;
    std::vector<Stack> stacks;
    while (true) {
        Stack st;
        if (!is_end(rule[pos])) st.push_back({start_rule, pos});
        advance_stack(*g->rules, st, stacks);
        while (!is_end(rule[pos])) pos++;
        if (rule[pos].type == ALT) pos++;
        else break;
    }
    dedup_stacks(stacks);
    g->stacks = std::move(stacks);
    return g;
}

// vocab: concatenated token bytes with offsets (n_tokens+1 entries);
// tokens with id >= token_eot are never considered.
void wtpu_grammar_set_vocab(void * handle, const uint8_t * bytes,
                            const int32_t * offsets, int n_tokens,
                            int token_eot) {
    auto * g = (Grammar *) handle;
    auto vocab = std::make_shared<Vocab>();
    vocab->token_eot = token_eot;
    vocab->tokens.resize(token_eot);
    for (int i = 0; i < token_eot && i < n_tokens; ++i) {
        auto & ti = vocab->tokens[i];
        ti.bytes.assign((const char *) bytes + offsets[i],
                        offsets[i + 1] - offsets[i]);
        ti.skip = ti.bytes.rfind("[_", 0) == 0;
        // precomputed code points for the clean-partial fast path
        ti.code_points = decode_utf8(ti.bytes, PartialUtf8{}).first;
    }
    // first-code-point buckets
    std::map<uint32_t, std::vector<int32_t>> by_cp;
    for (int i = 0; i < token_eot && i < n_tokens; ++i) {
        const auto & ti = vocab->tokens[i];
        if (ti.bytes.empty()) continue;
        by_cp[ti.code_points.empty() ? 0 : ti.code_points[0]].push_back(i);
    }
    vocab->buckets.assign(by_cp.begin(), by_cp.end());
    g->vocab = std::move(vocab);
}

void wtpu_grammar_suppress(void * handle, float * logits, int n_logits,
                           float penalty) {
    auto * g = (Grammar *) handle;
    if (!g->vocab || g->stacks.empty()) return;

    // candidate tokens under the current partial-utf8 state; the clean
    // state (overwhelmingly common) uses precomputed code points
    const int eot = g->vocab->token_eot;
    const bool clean = g->partial.value == 0 && g->partial.n_remain == 0;
    std::vector<std::vector<uint32_t>> cps;
    if (!clean) cps.resize(eot);
    std::vector<Candidate> cands;
    cands.reserve(eot);
    if (clean) {
        // bucket prune: a token whose FIRST code point can't start any
        // stack's next char is rejected by every stack at level 0 — the
        // whole bucket takes the penalty without entering the matcher
        for (const auto & bucket : g->vocab->buckets) {
            const uint32_t cp0 = bucket.first;
            bool may = (cp0 == 0);   // odd tokens -> slow path
            if (!may) {
                for (const auto & st : g->stacks) {
                    if (st.empty()) continue;
                    const Ref top = st.back();
                    if (match_char((*g->rules)[top.rule], top.pos,
                                   cp0).first) {
                        may = true;
                        break;
                    }
                }
            }
            if (may) {
                for (int32_t id : bucket.second) {
                    if (id < n_logits)
                        cands.push_back(
                            {id, g->vocab->tokens[id].code_points.data(),
                             g->partial});
                }
            } else {
                for (int32_t id : bucket.second) {
                    if (id < n_logits) logits[id] -= penalty;
                }
            }
        }
    } else {
        for (int id = 0; id < eot && id < n_logits; ++id) {
            const auto & ti = g->vocab->tokens[id];
            if (ti.bytes.empty()) continue;
            cps[id] = decode_utf8(ti.bytes, g->partial).first;
            cands.push_back({id, cps[id].data(), g->partial});
        }
    }
    std::vector<Candidate> rejects;
    reject_candidates(*g->rules, g->stacks, cands, rejects);
    for (const auto & r : rejects) {
        logits[r.id] -= penalty;
    }
}

void wtpu_grammar_accept(void * handle, int token) {
    auto * g = (Grammar *) handle;
    if (!g->vocab || g->stacks.empty()) return;
    if (token < 0 || token >= g->vocab->token_eot) return;
    const auto & ti = g->vocab->tokens[token];
    if (ti.skip) return;

    auto dec = decode_utf8(ti.bytes, g->partial);
    for (size_t i = 0; i + 1 < dec.first.size(); ++i) {
        const uint32_t chr = dec.first[i];
        std::vector<Stack> new_stacks;
        for (const auto & st : g->stacks) {
            if (st.empty()) continue;
            const Ref top = st.back();
            auto m = match_char((*g->rules)[top.rule], top.pos, chr);
            if (m.first) {
                Stack ns(st.begin(), st.end() - 1);
                const auto & rule = (*g->rules)[top.rule];
                if (m.second < (int) rule.size() && !is_end(rule[m.second])) {
                    ns.push_back({top.rule, m.second});
                }
                advance_stack(*g->rules, ns, new_stacks);
            }
        }
        dedup_stacks(new_stacks);
        g->stacks = std::move(new_stacks);
    }
    g->partial = dec.second;
}

int wtpu_grammar_n_stacks(void * handle) {
    return (int) ((Grammar *) handle)->stacks.size();
}

void * wtpu_grammar_clone(void * handle) {
    return new Grammar(*(Grammar *) handle);
}

void wtpu_grammar_free(void * handle) {
    delete (Grammar *) handle;
}

}  // extern "C"
