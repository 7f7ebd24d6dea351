// Node.js N-API addon for libwhisper_tpu.so — the whisper.h-compatible
// C ABI of the whisper_tpu TPU framework.
//
// Plays the role of the reference's addon.node (reference:
// examples/addon.node/addon.cpp, a napi C++ addon over whisper_full);
// written fresh against the whisper_tpu ABI using the plain C N-API so
// it needs no node-addon-api package — only the node headers that
// node-gyp ships.
//
// Build:   npx node-gyp rebuild        (see binding.gyp)
// Use:     const wtpu = require('whisper-tpu');   (see index.js)
//
// JS surface:
//   init(modelPath)                 -> external (context handle)
//   full(ctx, Float32Array, opts?)  -> segment count; opts keys:
//       language, translate, noTimestamps, tokenTimestamps, maxLen,
//       splitOnWord, beamSize, bestOf, temperature, temperatureInc,
//       initialPrompt, audioCtx, detectLanguage, nProcessors
//   segments(ctx)                   -> [{t0, t1, text, speakerTurnNext}]
//   detectedLangId(ctx)             -> int
//   free(ctx)
//   languages()                     -> [string]
//   systemInfo(), version()         -> string

#include <node_api.h>

#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "whisper_tpu.h"

namespace {

#define NAPI_CALL(env, call)                                     \
    do {                                                         \
        if ((call) != napi_ok) {                                 \
            napi_throw_error(env, nullptr, "N-API call failed: " #call); \
            return nullptr;                                      \
        }                                                        \
    } while (0)

std::string GetString(napi_env env, napi_value v) {
    size_t len = 0;
    napi_get_value_string_utf8(env, v, nullptr, 0, &len);
    std::string out(len, '\0');
    napi_get_value_string_utf8(env, v, out.data(), len + 1, &len);
    return out;
}

bool GetProp(napi_env env, napi_value obj, const char* key, napi_value* out) {
    bool has = false;
    if (napi_has_named_property(env, obj, key, &has) != napi_ok || !has) {
        return false;
    }
    return napi_get_named_property(env, obj, key, out) == napi_ok;
}

bool OptBool(napi_env env, napi_value obj, const char* key, bool dflt) {
    napi_value v;
    bool b = dflt;
    if (GetProp(env, obj, key, &v)) napi_get_value_bool(env, v, &b);
    return b;
}

int32_t OptInt(napi_env env, napi_value obj, const char* key, int32_t dflt) {
    napi_value v;
    int32_t i = dflt;
    if (GetProp(env, obj, key, &v)) napi_get_value_int32(env, v, &i);
    return i;
}

double OptNum(napi_env env, napi_value obj, const char* key, double dflt) {
    napi_value v;
    double d = dflt;
    if (GetProp(env, obj, key, &v)) napi_get_value_double(env, v, &d);
    return d;
}

// Context handle: the whisper_context plus interned strings the params
// point into (the ABI does not copy language/prompt pointers).
struct Handle {
    whisper_context* ctx = nullptr;
    std::string language;
    std::string prompt;
};

Handle* GetHandle(napi_env env, napi_value v) {
    void* p = nullptr;
    if (napi_get_value_external(env, v, &p) != napi_ok || p == nullptr) {
        napi_throw_type_error(env, nullptr, "expected a whisper-tpu context");
        return nullptr;
    }
    return static_cast<Handle*>(p);
}

napi_value Init(napi_env env, napi_callback_info info) {
    size_t argc = 1;
    napi_value args[1];
    NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, nullptr, nullptr));
    if (argc < 1) {
        napi_throw_type_error(env, nullptr, "init(modelPath) requires a path");
        return nullptr;
    }
    std::string path = GetString(env, args[0]);
    whisper_context* ctx = whisper_init_from_file(path.c_str());
    if (ctx == nullptr) {
        napi_throw_error(env, nullptr,
                         ("failed to load model: " + path).c_str());
        return nullptr;
    }
    auto* h = new Handle();
    h->ctx = ctx;
    napi_value ext;
    NAPI_CALL(env, napi_create_external(
            env, h,
            [](napi_env, void* data, void*) {
                auto* h = static_cast<Handle*>(data);
                if (h->ctx) whisper_free(h->ctx);
                delete h;
            },
            nullptr, &ext));
    return ext;
}

napi_value Free(napi_env env, napi_callback_info info) {
    size_t argc = 1;
    napi_value args[1];
    NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, nullptr, nullptr));
    Handle* h = GetHandle(env, args[0]);
    if (h != nullptr && h->ctx != nullptr) {
        whisper_free(h->ctx);
        h->ctx = nullptr;
    }
    napi_value undef;
    NAPI_CALL(env, napi_get_undefined(env, &undef));
    return undef;
}

napi_value Full(napi_env env, napi_callback_info info) {
    size_t argc = 3;
    napi_value args[3];
    NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, nullptr, nullptr));
    if (argc < 2) {
        napi_throw_type_error(env, nullptr,
                              "full(ctx, Float32Array, opts?) requires PCM");
        return nullptr;
    }
    Handle* h = GetHandle(env, args[0]);
    if (h == nullptr || h->ctx == nullptr) return nullptr;

    napi_typedarray_type ta_type;
    size_t n = 0;
    void* pcm = nullptr;
    napi_value buffer;
    size_t offset = 0;
    if (napi_get_typedarray_info(env, args[1], &ta_type, &n, &pcm, &buffer,
                                 &offset) != napi_ok ||
        ta_type != napi_float32_array || n == 0) {
        napi_throw_type_error(env, nullptr,
                              "PCM must be a non-empty Float32Array "
                              "(mono 16 kHz)");
        return nullptr;
    }

    whisper_full_params p =
            whisper_full_default_params(WHISPER_SAMPLING_GREEDY);
    int n_processors = 1;
    if (argc >= 3) {
        napi_value opts = args[2];
        napi_valuetype t;
        napi_typeof(env, opts, &t);
        if (t == napi_object) {
            napi_value v;
            if (GetProp(env, opts, "language", &v)) {
                h->language = GetString(env, v);
                p.language = h->language.c_str();
            }
            if (GetProp(env, opts, "initialPrompt", &v)) {
                h->prompt = GetString(env, v);
                p.initial_prompt = h->prompt.c_str();
            }
            p.translate = OptBool(env, opts, "translate", p.translate);
            p.no_timestamps =
                    OptBool(env, opts, "noTimestamps", p.no_timestamps);
            p.token_timestamps =
                    OptBool(env, opts, "tokenTimestamps", p.token_timestamps);
            p.split_on_word =
                    OptBool(env, opts, "splitOnWord", p.split_on_word);
            p.detect_language =
                    OptBool(env, opts, "detectLanguage", p.detect_language);
            p.max_len = OptInt(env, opts, "maxLen", p.max_len);
            p.audio_ctx = OptInt(env, opts, "audioCtx", p.audio_ctx);
            p.greedy.best_of = OptInt(env, opts, "bestOf", p.greedy.best_of);
            int beam = OptInt(env, opts, "beamSize", -1);
            if (beam > 0) {
                p.strategy = WHISPER_SAMPLING_BEAM_SEARCH;
                p.beam_search.beam_size = beam;
            }
            p.temperature =
                    (float) OptNum(env, opts, "temperature", p.temperature);
            p.temperature_inc = (float) OptNum(env, opts, "temperatureInc",
                                               p.temperature_inc);
            n_processors = OptInt(env, opts, "nProcessors", 1);
        }
    }

    const float* samples = static_cast<const float*>(pcm);
    int rc = n_processors > 1
            ? whisper_full_parallel(h->ctx, p, samples, (int) n, n_processors)
            : whisper_full(h->ctx, p, samples, (int) n);
    if (rc != 0) {
        napi_throw_error(env, nullptr,
                         ("whisper_full failed: rc=" + std::to_string(rc))
                                 .c_str());
        return nullptr;
    }
    napi_value out;
    NAPI_CALL(env, napi_create_int32(env, whisper_full_n_segments(h->ctx),
                                     &out));
    return out;
}

napi_value Segments(napi_env env, napi_callback_info info) {
    size_t argc = 1;
    napi_value args[1];
    NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, nullptr, nullptr));
    Handle* h = GetHandle(env, args[0]);
    if (h == nullptr || h->ctx == nullptr) return nullptr;

    int n = whisper_full_n_segments(h->ctx);
    napi_value arr;
    NAPI_CALL(env, napi_create_array_with_length(env, (size_t) n, &arr));
    for (int i = 0; i < n; i++) {
        napi_value seg, t0, t1, text, turn;
        NAPI_CALL(env, napi_create_object(env, &seg));
        NAPI_CALL(env, napi_create_double(
                env, whisper_full_get_segment_t0(h->ctx, i) / 100.0, &t0));
        NAPI_CALL(env, napi_create_double(
                env, whisper_full_get_segment_t1(h->ctx, i) / 100.0, &t1));
        NAPI_CALL(env, napi_create_string_utf8(
                env, whisper_full_get_segment_text(h->ctx, i),
                NAPI_AUTO_LENGTH, &text));
        NAPI_CALL(env, napi_get_boolean(
                env, whisper_full_get_segment_speaker_turn_next(h->ctx, i),
                &turn));
        NAPI_CALL(env, napi_set_named_property(env, seg, "t0", t0));
        NAPI_CALL(env, napi_set_named_property(env, seg, "t1", t1));
        NAPI_CALL(env, napi_set_named_property(env, seg, "text", text));
        NAPI_CALL(env, napi_set_named_property(env, seg, "speakerTurnNext",
                                               turn));
        NAPI_CALL(env, napi_set_element(env, arr, (uint32_t) i, seg));
    }
    return arr;
}

napi_value DetectedLangId(napi_env env, napi_callback_info info) {
    size_t argc = 1;
    napi_value args[1];
    NAPI_CALL(env, napi_get_cb_info(env, info, &argc, args, nullptr, nullptr));
    Handle* h = GetHandle(env, args[0]);
    if (h == nullptr || h->ctx == nullptr) return nullptr;
    napi_value out;
    NAPI_CALL(env, napi_create_int32(env, whisper_full_lang_id(h->ctx), &out));
    return out;
}

napi_value Languages(napi_env env, napi_callback_info info) {
    int max = whisper_lang_max_id();
    napi_value arr;
    NAPI_CALL(env, napi_create_array_with_length(env, (size_t) max + 1, &arr));
    for (int i = 0; i <= max; i++) {
        napi_value s;
        NAPI_CALL(env, napi_create_string_utf8(env, whisper_lang_str(i),
                                               NAPI_AUTO_LENGTH, &s));
        NAPI_CALL(env, napi_set_element(env, arr, (uint32_t) i, s));
    }
    return arr;
}

napi_value SystemInfo(napi_env env, napi_callback_info info) {
    napi_value s;
    NAPI_CALL(env, napi_create_string_utf8(env, whisper_print_system_info(),
                                           NAPI_AUTO_LENGTH, &s));
    return s;
}

napi_value Version(napi_env env, napi_callback_info info) {
    napi_value s;
    NAPI_CALL(env, napi_create_string_utf8(env, whisper_version(),
                                           NAPI_AUTO_LENGTH, &s));
    return s;
}

napi_value ModuleInit(napi_env env, napi_value exports) {
    const napi_property_descriptor props[] = {
        {"init", nullptr, Init, nullptr, nullptr, nullptr, napi_default,
         nullptr},
        {"free", nullptr, Free, nullptr, nullptr, nullptr, napi_default,
         nullptr},
        {"full", nullptr, Full, nullptr, nullptr, nullptr, napi_default,
         nullptr},
        {"segments", nullptr, Segments, nullptr, nullptr, nullptr,
         napi_default, nullptr},
        {"detectedLangId", nullptr, DetectedLangId, nullptr, nullptr, nullptr,
         napi_default, nullptr},
        {"languages", nullptr, Languages, nullptr, nullptr, nullptr,
         napi_default, nullptr},
        {"systemInfo", nullptr, SystemInfo, nullptr, nullptr, nullptr,
         napi_default, nullptr},
        {"version", nullptr, Version, nullptr, nullptr, nullptr, napi_default,
         nullptr},
    };
    napi_define_properties(env, exports,
                           sizeof(props) / sizeof(props[0]), props);
    return exports;
}

}  // namespace

NAPI_MODULE(whisper_tpu, ModuleInit)
