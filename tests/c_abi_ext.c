/* Exercises the C ABI surface beyond transcription: raw mel/encode/decode
 * with logits, model introspection, language helpers, timings, state
 * accessors, and the log callback.  Driven by tests/test_cabi.py. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "whisper_tpu.h"

static int n_logs = 0;
static void on_log(int level, const char * text, void * ud) {
    (void) level; (void) text; (void) ud;
    n_logs++;
}

/* ---- callback + grammar fixtures ---------------------------------------- */

static int n_abort_calls = 0;
static bool abort_now(void * ud) {
    (void) ud;
    n_abort_calls++;
    return true;                  /* stop at the first per-window check */
}

static int n_encb_calls = 0;
static int g_encb_state_segs = -2;
static bool encoder_begin_veto(struct whisper_context * ctx,
                               struct whisper_state * st, void * ud) {
    (void) ctx; (void) ud;
    n_encb_calls++;
    /* the state pointer must be live and usable with *_from_state
     * accessors, like the reference's ctx->state (a NULL here would
     * segfault conforming clients — regression, round 3) */
    if (st) g_encb_state_segs = whisper_full_n_segments_from_state(st);
    return false;                 /* veto every window */
}

static int n_lfilt_calls = 0;
static whisper_token g_forced_token = 0;
static void force_token_filter(struct whisper_context * ctx,
                               struct whisper_state * st,
                               const whisper_token_data * tokens,
                               int n_tokens, float * logits, void * ud) {
    (void) ctx; (void) st; (void) tokens; (void) n_tokens; (void) ud;
    n_lfilt_calls++;
    /* force one specific text token by a margin no random logit reaches */
    logits[g_forced_token] += 1e6f;
}

/* deterministic noise PCM (LCG), loud enough to transcribe */
static void fill_noise(float * pcm, int n) {
    unsigned s = 12345u;
    for (int i = 0; i < n; i++) {
        s = s * 1664525u + 1013904223u;
        pcm[i] = ((float)(s >> 8) / (float)(1u << 24) - 0.5f) * 0.2f;
    }
}

int main(int argc, char ** argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s model.bin\n", argv[0]); return 2; }

    whisper_log_set(on_log, NULL);

    struct whisper_context_params * cp = whisper_context_default_params_by_ref();
    struct whisper_context * ctx =
        whisper_init_from_file_with_params(argv[1], *cp);
    whisper_free_context_params(cp);
    if (!ctx) { fprintf(stderr, "init failed\n"); return 1; }

    printf("MODEL|%d|%d|%d|%d|%s\n",
           whisper_model_n_vocab(ctx), whisper_model_n_audio_layer(ctx),
           whisper_model_n_text_layer(ctx), whisper_model_n_mels(ctx),
           whisper_model_type_readable(ctx));
    printf("LANG|%d|%s|%s\n", whisper_lang_max_id(),
           whisper_lang_str(0), whisper_lang_str_full(0));

    /* raw path: 1 s of silence -> mel -> encode -> decode sot */
    int n = 16000;
    float * pcm = (float *) calloc(n, sizeof(float));
    if (whisper_pcm_to_mel(ctx, pcm, n, 1) != 0) return 1;
    printf("NLEN|%d\n", whisper_n_len(ctx));
    if (whisper_encode(ctx, 0, 1) != 0) return 1;
    whisper_token sot = whisper_token_sot(ctx);
    whisper_token toks[3] = { sot, (whisper_token)(sot + 1), 0 };
    if (whisper_decode(ctx, toks, 2, 0, 1) != 0) return 1;
    float * logits = whisper_get_logits(ctx);
    if (!logits) return 1;
    /* 2 prompt tokens -> 2 rows; both rows must hold finite floats */
    int V = whisper_n_vocab(ctx);
    double s0 = 0, s1 = 0;
    for (int i = 0; i < V; i++) { s0 += logits[i] < 0 ? -1 : 1;
                                  s1 += logits[V + i] < 0 ? -1 : 1; }
    printf("LOGITS|%d|%s\n", V, (s0 != 0 || s1 != 0) ? "ok" : "flat");

    /* per-state raw path must not disturb the ctx default state */
    struct whisper_state * st = whisper_init_state(ctx);
    if (!st) return 1;
    if (whisper_pcm_to_mel_with_state(ctx, st, pcm, n, 1) != 0) return 1;
    printf("NLEN_ST|%d\n", whisper_n_len_from_state(st));
    if (whisper_encode_with_state(ctx, st, 0, 1) != 0) return 1;
    if (whisper_decode_with_state(ctx, st, toks, 1, 0, 1) != 0) return 1;
    printf("LOGITS_ST|%s\n",
           whisper_get_logits_from_state(st) ? "ok" : "null");

    struct whisper_timings * t = whisper_get_timings(ctx);
    printf("TIMINGS|%s\n", t && t->encode_ms >= 0 ? "ok" : "bad");

    whisper_free_state(st);

    /* ---- full() behavioral callbacks (reference: whisper.h:449-473) ---- */

    int nw = 16000 * 8;                         /* 8 s -> several windows */
    float * wpcm = (float *) malloc(nw * sizeof(float));
    fill_noise(wpcm, nw);

    struct whisper_full_params fp =
        whisper_full_default_params(WHISPER_SAMPLING_GREEDY);
    fp.print_progress = false;
    fp.temperature_inc = 0.0f;
    fp.greedy.best_of = 1;

    /* baseline segment count with no callbacks */
    if (whisper_full(ctx, fp, wpcm, nw) != 0) return 1;
    int n_base = whisper_full_n_segments(ctx);
    printf("BASE_SEGS|%d\n", n_base);

    /* abort at the first window check -> zero segments */
    fp.abort_callback = abort_now;
    if (whisper_full(ctx, fp, wpcm, nw) != 0) return 1;
    printf("ABORT|%d|%d\n", n_abort_calls, whisper_full_n_segments(ctx));
    fp.abort_callback = NULL;

    /* encoder_begin veto -> no windows encoded, zero segments; the
     * callback also dereferences its whisper_state* (>= 0 proves it) */
    fp.encoder_begin_callback = encoder_begin_veto;
    if (whisper_full(ctx, fp, wpcm, nw) != 0) return 1;
    printf("ENCB|%d|%d|%d\n", n_encb_calls, whisper_full_n_segments(ctx),
           g_encb_state_segs);
    fp.encoder_begin_callback = NULL;

    /* logits_filter forcing one text token: every decoded text token of
     * the first segment must be the forced one */
    g_forced_token = 333;
    fp.logits_filter_callback = force_token_filter;
    fp.max_tokens = 4;
    if (whisper_full(ctx, fp, wpcm, nw) != 0) return 1;
    int forced_ok = whisper_full_n_segments(ctx) > 0;
    for (int i = 0; i < whisper_full_n_segments(ctx) && forced_ok; i++) {
        for (int j = 0; j < whisper_full_n_tokens(ctx, i); j++) {
            whisper_token id = whisper_full_get_token_id(ctx, i, j);
            if (id < whisper_token_eot(ctx) && id != g_forced_token)
                forced_ok = 0;
        }
    }
    printf("LFILT|%d|%s\n", n_lfilt_calls, forced_ok ? "ok" : "bad");
    fp.logits_filter_callback = NULL;
    fp.max_tokens = 0;

    /* in-struct grammar: root ::= [a-z ]* — every decoded text char must
     * stay inside the class (reference: whisper.h:546-551) */
    whisper_grammar_element r0[] = {
        {WHISPER_GRETYPE_RULE_REF, 1}, {WHISPER_GRETYPE_END, 0}};
    whisper_grammar_element r1[] = {
        {WHISPER_GRETYPE_CHAR, 'a'}, {WHISPER_GRETYPE_CHAR_RNG_UPPER, 'z'},
        {WHISPER_GRETYPE_CHAR_ALT, ' '}, {WHISPER_GRETYPE_RULE_REF, 1},
        {WHISPER_GRETYPE_ALT, 0}, {WHISPER_GRETYPE_END, 0}};
    const whisper_grammar_element * rules[] = {r0, r1};
    fp.grammar_rules = rules;
    fp.n_grammar_rules = 2;
    fp.i_start_rule = 0;
    fp.grammar_penalty = 100.0f;
    if (whisper_full(ctx, fp, wpcm, nw) != 0) return 1;
    int gram_ok = whisper_full_n_segments(ctx) > 0;
    int n_gram_text = 0;
    for (int i = 0; i < whisper_full_n_segments(ctx) && gram_ok; i++) {
        const char * text = whisper_full_get_segment_text(ctx, i);
        for (const char * c = text; *c; c++) {
            if (!((*c >= 'a' && *c <= 'z') || *c == ' ')) gram_ok = 0;
            n_gram_text++;
        }
    }
    printf("GRAMMAR|%s|%d\n",
           gram_ok && n_gram_text > 0 ? "ok" : "bad", n_gram_text);
    /* segment texts for byte-parity with the Python GBNF path */
    for (int i = 0; i < whisper_full_n_segments(ctx); i++)
        printf("GSEG|%s\n", whisper_full_get_segment_text(ctx, i));

    whisper_free(ctx);
    free(pcm);
    free(wpcm);
    printf("LOGS|%s\n", n_logs > 0 ? "captured" : "none");
    printf("DONE\n");
    return 0;
}
