/* whisper_tpu C ABI — a whisper.h-compatible C interface to the TPU
 * framework (reference interface: include/whisper.h; this header mirrors
 * the reference's public types and signatures so C programs written
 * against whisper.h can link against libwhisper_tpu.so instead).
 *
 * Implementation: native/wtpu_capi.cpp embeds a CPython interpreter and
 * marshals into whisper_tpu.capi.  See that file for the coverage list.
 *
 * Struct layouts (whisper_full_params, whisper_context_params,
 * whisper_token_data) match the reference header field-for-field — they
 * ARE the ABI contract.
 */
#ifndef WHISPER_TPU_H
#define WHISPER_TPU_H

#include <stdbool.h>
#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define WHISPER_SAMPLE_RATE 16000
#define WHISPER_N_FFT       400
#define WHISPER_HOP_LENGTH  160
#define WHISPER_CHUNK_SIZE  30

struct whisper_context;
struct whisper_state;

typedef int32_t whisper_token;
typedef int32_t whisper_pos;
typedef int32_t whisper_seq_id;

enum whisper_alignment_heads_preset {
    WHISPER_AHEADS_NONE,
    WHISPER_AHEADS_N_TOP_MOST,
    WHISPER_AHEADS_CUSTOM,
    WHISPER_AHEADS_TINY_EN,
    WHISPER_AHEADS_TINY,
    WHISPER_AHEADS_BASE_EN,
    WHISPER_AHEADS_BASE,
    WHISPER_AHEADS_SMALL_EN,
    WHISPER_AHEADS_SMALL,
    WHISPER_AHEADS_MEDIUM_EN,
    WHISPER_AHEADS_MEDIUM,
    WHISPER_AHEADS_LARGE_V1,
    WHISPER_AHEADS_LARGE_V2,
    WHISPER_AHEADS_LARGE_V3,
    WHISPER_AHEADS_LARGE_V3_TURBO,
};

typedef struct whisper_ahead {
    int n_text_layer;
    int n_head;
} whisper_ahead;

typedef struct whisper_aheads {
    size_t n_heads;
    const whisper_ahead * heads;
} whisper_aheads;

struct whisper_context_params {
    bool  use_gpu;
    bool  flash_attn;
    int   gpu_device;

    bool dtw_token_timestamps;
    enum whisper_alignment_heads_preset dtw_aheads_preset;

    int dtw_n_top;
    struct whisper_aheads dtw_aheads;

    size_t dtw_mem_size;
};

typedef struct whisper_token_data {
    whisper_token id;
    whisper_token tid;

    float p;
    float plog;
    float pt;
    float ptsum;

    int64_t t0;
    int64_t t1;

    int64_t t_dtw;

    float vlen;
} whisper_token_data;

enum whisper_sampling_strategy {
    WHISPER_SAMPLING_GREEDY,
    WHISPER_SAMPLING_BEAM_SEARCH,
};

typedef void (*whisper_new_segment_callback)(struct whisper_context * ctx, struct whisper_state * state, int n_new, void * user_data);
typedef void (*whisper_progress_callback)(struct whisper_context * ctx, struct whisper_state * state, int progress, void * user_data);
typedef bool (*whisper_encoder_begin_callback)(struct whisper_context * ctx, struct whisper_state * state, void * user_data);
typedef bool (*whisper_abort_callback)(void * user_data);
typedef void (*whisper_logits_filter_callback)(struct whisper_context * ctx, struct whisper_state * state, const whisper_token_data * tokens, int n_tokens, float * logits, void * user_data);

/* GBNF element types (reference: include/whisper.h:162-186) */
enum whisper_gretype {
    WHISPER_GRETYPE_END            = 0,  /* end of rule definition */
    WHISPER_GRETYPE_ALT            = 1,  /* start of alternate definition */
    WHISPER_GRETYPE_RULE_REF       = 2,  /* reference to another rule */
    WHISPER_GRETYPE_CHAR           = 3,  /* terminal code point */
    WHISPER_GRETYPE_CHAR_NOT       = 4,  /* inverse char class [^...] */
    WHISPER_GRETYPE_CHAR_RNG_UPPER = 5,  /* upper bound of range [a-z] */
    WHISPER_GRETYPE_CHAR_ALT       = 6,  /* alternate char [ab] */
};

typedef struct whisper_grammar_element {
    enum whisper_gretype type;
    uint32_t             value; /* Unicode code point or rule ID */
} whisper_grammar_element;

struct whisper_full_params {
    enum whisper_sampling_strategy strategy;

    int n_threads;
    int n_max_text_ctx;
    int offset_ms;
    int duration_ms;

    bool translate;
    bool no_context;
    bool no_timestamps;
    bool single_segment;
    bool print_special;
    bool print_progress;
    bool print_realtime;
    bool print_timestamps;

    bool  token_timestamps;
    float thold_pt;
    float thold_ptsum;
    int   max_len;
    bool  split_on_word;
    int   max_tokens;

    bool debug_mode;
    int  audio_ctx;

    bool tdrz_enable;

    const char * suppress_regex;

    const char * initial_prompt;
    const whisper_token * prompt_tokens;
    int prompt_n_tokens;

    const char * language;
    bool detect_language;

    bool suppress_blank;
    bool suppress_nst;

    float temperature;
    float max_initial_ts;
    float length_penalty;

    float temperature_inc;
    float entropy_thold;
    float logprob_thold;
    float no_speech_thold;

    struct {
        int best_of;
    } greedy;

    struct {
        int beam_size;
        float patience;
    } beam_search;

    whisper_new_segment_callback new_segment_callback;
    void * new_segment_callback_user_data;

    whisper_progress_callback progress_callback;
    void * progress_callback_user_data;

    whisper_encoder_begin_callback encoder_begin_callback;
    void * encoder_begin_callback_user_data;

    whisper_abort_callback abort_callback;
    void * abort_callback_user_data;

    whisper_logits_filter_callback logits_filter_callback;
    void * logits_filter_callback_user_data;

    const whisper_grammar_element ** grammar_rules;
    size_t                           n_grammar_rules;
    size_t                           i_start_rule;
    float                            grammar_penalty;
};

typedef struct whisper_model_loader {
    void * context;
    size_t (*read)(void * ctx, void * output, size_t read_size);
    bool (*eof)(void * ctx);
    void (*close)(void * ctx);
} whisper_model_loader;

struct whisper_timings {
    float sample_ms;
    float encode_ms;
    float decode_ms;
    float batchd_ms;
    float prompt_ms;
};

typedef void (*whisper_tpu_log_callback)(int level, const char * text, void * user_data);

/* ---- init / free ---- */
struct whisper_context_params whisper_context_default_params(void);
struct whisper_context * whisper_init_from_file_with_params(const char * path_model, struct whisper_context_params params);
struct whisper_context * whisper_init_from_file(const char * path_model);
struct whisper_state * whisper_init_state(struct whisper_context * ctx);
void whisper_free(struct whisper_context * ctx);
void whisper_free_state(struct whisper_state * state);

/* ---- transcription ---- */
struct whisper_full_params whisper_full_default_params(enum whisper_sampling_strategy strategy);
int whisper_full(struct whisper_context * ctx, struct whisper_full_params params, const float * samples, int n_samples);
int whisper_full_with_state(struct whisper_context * ctx, struct whisper_state * state, struct whisper_full_params params, const float * samples, int n_samples);
int whisper_full_parallel(struct whisper_context * ctx, struct whisper_full_params params, const float * samples, int n_samples, int n_processors);

/* ---- results ---- */
int whisper_full_n_segments(struct whisper_context * ctx);
int whisper_full_n_segments_from_state(struct whisper_state * state);
int whisper_full_lang_id(struct whisper_context * ctx);
int64_t whisper_full_get_segment_t0(struct whisper_context * ctx, int i_segment);
int64_t whisper_full_get_segment_t1(struct whisper_context * ctx, int i_segment);
bool whisper_full_get_segment_speaker_turn_next(struct whisper_context * ctx, int i_segment);
const char * whisper_full_get_segment_text(struct whisper_context * ctx, int i_segment);
int whisper_full_n_tokens(struct whisper_context * ctx, int i_segment);
const char * whisper_full_get_token_text(struct whisper_context * ctx, int i_segment, int i_token);
whisper_token whisper_full_get_token_id(struct whisper_context * ctx, int i_segment, int i_token);
whisper_token_data whisper_full_get_token_data(struct whisper_context * ctx, int i_segment, int i_token);
float whisper_full_get_token_p(struct whisper_context * ctx, int i_segment, int i_token);
int64_t whisper_full_get_segment_t0_from_state(struct whisper_state * state, int i_segment);
int64_t whisper_full_get_segment_t1_from_state(struct whisper_state * state, int i_segment);
const char * whisper_full_get_segment_text_from_state(struct whisper_state * state, int i_segment);

/* ---- model / vocab introspection ---- */
int whisper_n_vocab(struct whisper_context * ctx);
int whisper_n_text_ctx(struct whisper_context * ctx);
int whisper_n_audio_ctx(struct whisper_context * ctx);
int whisper_is_multilingual(struct whisper_context * ctx);
const char * whisper_token_to_str(struct whisper_context * ctx, whisper_token token);
whisper_token whisper_token_eot(struct whisper_context * ctx);
whisper_token whisper_token_sot(struct whisper_context * ctx);
whisper_token whisper_token_solm(struct whisper_context * ctx);
whisper_token whisper_token_prev(struct whisper_context * ctx);
whisper_token whisper_token_nosp(struct whisper_context * ctx);
whisper_token whisper_token_not(struct whisper_context * ctx);
whisper_token whisper_token_beg(struct whisper_context * ctx);
whisper_token whisper_token_lang(struct whisper_context * ctx, int lang_id);
whisper_token whisper_token_translate(struct whisper_context * ctx);
whisper_token whisper_token_transcribe(struct whisper_context * ctx);

/* ---- tokenization / language ---- */
int whisper_tokenize(struct whisper_context * ctx, const char * text, whisper_token * tokens, int n_max_tokens);
int whisper_token_count(struct whisper_context * ctx, const char * text);
int whisper_lang_max_id(void);
int whisper_lang_id(const char * lang);
const char * whisper_lang_str(int id);
const char * whisper_lang_str_full(int id);

/* ---- misc ---- */
int whisper_pcm_to_mel(struct whisper_context * ctx, const float * samples, int n_samples, int n_threads);
void whisper_print_timings(struct whisper_context * ctx);
void whisper_reset_timings(struct whisper_context * ctx);
const char * whisper_print_system_info(void);
const char * whisper_version(void);


/* ---- init variants (buffer / loader / no_state; whisper.h:195-228) ---- */
struct whisper_context * whisper_init_from_buffer_with_params(void * buffer, size_t buffer_size, struct whisper_context_params params);
struct whisper_context * whisper_init_with_params(struct whisper_model_loader * loader, struct whisper_context_params params);
struct whisper_context * whisper_init_from_file_with_params_no_state(const char * path_model, struct whisper_context_params params);
struct whisper_context * whisper_init_from_buffer_with_params_no_state(void * buffer, size_t buffer_size, struct whisper_context_params params);
struct whisper_context * whisper_init_with_params_no_state(struct whisper_model_loader * loader, struct whisper_context_params params);
struct whisper_context * whisper_init_from_file_no_state(const char * path_model);
struct whisper_context * whisper_init_from_buffer(void * buffer, size_t buffer_size);
struct whisper_context * whisper_init_from_buffer_no_state(void * buffer, size_t buffer_size);
struct whisper_context * whisper_init(struct whisper_model_loader * loader);
struct whisper_context * whisper_init_no_state(struct whisper_model_loader * loader);
struct whisper_context_params * whisper_context_default_params_by_ref(void);
struct whisper_full_params * whisper_full_default_params_by_ref(enum whisper_sampling_strategy strategy);

/* whisper_tpu extensions: by-pointer forwards for FFI bindings that
 * cannot pass structs by value (ruby fiddle / java Panama / node FFI).
 * Semantics identical to the by-value originals. */
int whisper_full_ref(struct whisper_context * ctx, const struct whisper_full_params * params, const float * samples, int n_samples);
int whisper_full_with_state_ref(struct whisper_context * ctx, struct whisper_state * state, const struct whisper_full_params * params, const float * samples, int n_samples);
int whisper_full_parallel_ref(struct whisper_context * ctx, const struct whisper_full_params * params, const float * samples, int n_samples, int n_processors);
struct whisper_context * whisper_init_from_file_with_params_ref(const char * path_model, const struct whisper_context_params * params);
void whisper_free_params(struct whisper_full_params * params);
void whisper_free_context_params(struct whisper_context_params * params);
int whisper_ctx_init_openvino_encoder(struct whisper_context * ctx, const char * model_path, const char * device, const char * cache_dir);
int whisper_ctx_init_openvino_encoder_with_state(struct whisper_context * ctx, struct whisper_state * state, const char * model_path, const char * device, const char * cache_dir);

/* ---- raw mel / encode / decode (whisper.h:264-344) ---- */
int whisper_pcm_to_mel_with_state(struct whisper_context * ctx, struct whisper_state * state, const float * samples, int n_samples, int n_threads);
int whisper_set_mel(struct whisper_context * ctx, const float * data, int n_len, int n_mel);
int whisper_set_mel_with_state(struct whisper_context * ctx, struct whisper_state * state, const float * data, int n_len, int n_mel);
int whisper_encode(struct whisper_context * ctx, int offset, int n_threads);
int whisper_encode_with_state(struct whisper_context * ctx, struct whisper_state * state, int offset, int n_threads);
int whisper_decode(struct whisper_context * ctx, const whisper_token * tokens, int n_tokens, int n_past, int n_threads);
int whisper_decode_with_state(struct whisper_context * ctx, struct whisper_state * state, const whisper_token * tokens, int n_tokens, int n_past, int n_threads);
float * whisper_get_logits(struct whisper_context * ctx);
float * whisper_get_logits_from_state(struct whisper_state * state);
int whisper_n_len(struct whisper_context * ctx);
int whisper_n_len_from_state(struct whisper_state * state);
int whisper_lang_auto_detect(struct whisper_context * ctx, int offset_ms, int n_threads, float * lang_probs);
int whisper_lang_auto_detect_with_state(struct whisper_context * ctx, struct whisper_state * state, int offset_ms, int n_threads, float * lang_probs);

/* ---- from_state result accessors (whisper.h:611-657) ---- */
int whisper_full_lang_id_from_state(struct whisper_state * state);
bool whisper_full_get_segment_speaker_turn_next_from_state(struct whisper_state * state, int i_segment);
float whisper_full_get_segment_no_speech_prob(struct whisper_context * ctx, int i_segment);
float whisper_full_get_segment_no_speech_prob_from_state(struct whisper_state * state, int i_segment);
int whisper_full_n_tokens_from_state(struct whisper_state * state, int i_segment);
const char * whisper_full_get_token_text_from_state(struct whisper_context * ctx, struct whisper_state * state, int i_segment, int i_token);
whisper_token whisper_full_get_token_id_from_state(struct whisper_state * state, int i_segment, int i_token);
whisper_token_data whisper_full_get_token_data_from_state(struct whisper_state * state, int i_segment, int i_token);
float whisper_full_get_token_p_from_state(struct whisper_state * state, int i_segment, int i_token);

/* ---- model introspection (whisper.h:380-439) ---- */
int whisper_model_n_vocab(struct whisper_context * ctx);
int whisper_model_n_audio_ctx(struct whisper_context * ctx);
int whisper_model_n_audio_state(struct whisper_context * ctx);
int whisper_model_n_audio_head(struct whisper_context * ctx);
int whisper_model_n_audio_layer(struct whisper_context * ctx);
int whisper_model_n_text_ctx(struct whisper_context * ctx);
int whisper_model_n_text_state(struct whisper_context * ctx);
int whisper_model_n_text_head(struct whisper_context * ctx);
int whisper_model_n_text_layer(struct whisper_context * ctx);
int whisper_model_n_mels(struct whisper_context * ctx);
int whisper_model_ftype(struct whisper_context * ctx);
int whisper_model_type(struct whisper_context * ctx);
const char * whisper_model_type_readable(struct whisper_context * ctx);
struct whisper_timings * whisper_get_timings(struct whisper_context * ctx);

/* ---- bench + logging (whisper.h:659-666) ---- */
int whisper_bench_memcpy(int n_threads);
const char * whisper_bench_memcpy_str(int n_threads);
int whisper_bench_ggml_mul_mat(int n_threads);
const char * whisper_bench_ggml_mul_mat_str(int n_threads);
void whisper_log_set(whisper_tpu_log_callback log_callback, void * user_data);

#ifdef __cplusplus
}
#endif

#endif /* WHISPER_TPU_H */
