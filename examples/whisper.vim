" Voice control glue for Vim over the whisper_tpu LSP example
" (reference: examples/lsp/whisper.vim; this is a compact client for
" whisper_tpu.lsp's JSON-RPC surface: transcribe / guided).
"
" Setup in vimrc:
"   let g:whisper_tpu_dir = "/path/to/whisper_tpu-repo/"
"   let g:whisper_model_path = g:whisper_tpu_dir .. "models/ggml-base.en.bin"
"   source /path/to/examples/whisper.vim
"
" Then:
"   :call whisper#transcribe("speech.wav")   -> inserts text at the cursor
"   :call whisper#guided("speech.wav", ["yes", "no", "cancel"])

if !exists("g:whisper_tpu_dir")
    let g:whisper_tpu_dir = expand($WHISPER_TPU_HOME)
endif
if !exists("g:whisper_model_path")
    let g:whisper_model_path = g:whisper_tpu_dir .. "models/ggml-base.en.bin"
endif

let s:lsp_command = ["python3", "-m", "whisper_tpu.lsp",
            \ "-m", g:whisper_model_path]
let s:seq = 0

func s:start()
    if exists("g:whisper_lsp_job") && job_status(g:whisper_lsp_job) == "run"
        return
    endif
    let g:whisper_lsp_job = job_start(s:lsp_command,
                \ {"cwd": g:whisper_tpu_dir})
    let g:whisper_lsp_ch = job_getchannel(g:whisper_lsp_job)
endfunc

" send one Content-Length framed JSON-RPC request, wait for the reply
func s:request(method, params)
    call s:start()
    let s:seq += 1
    let l:body = json_encode({"jsonrpc": "2.0", "id": s:seq,
                \ "method": a:method, "params": a:params})
    call ch_sendraw(g:whisper_lsp_ch,
                \ "Content-Length: " .. len(l:body) .. "\r\n\r\n" .. l:body)
    " header line, blank line, then the payload
    let l:hdr = ch_readraw(g:whisper_lsp_ch)
    let l:len = str2nr(matchstr(l:hdr, '\d\+'))
    call ch_readraw(g:whisper_lsp_ch)
    return json_decode(ch_readraw(g:whisper_lsp_ch))
endfunc

func whisper#transcribe(wav_file)
    let l:resp = s:request("transcribe", {"file": a:wav_file})
    if has_key(l:resp, "result")
        execute "normal! a" .. trim(l:resp.result.text)
    else
        echoerr "whisper: " .. string(get(l:resp, "error", "no reply"))
    endif
endfunc

func whisper#guided(wav_file, commands)
    let l:resp = s:request("guided",
                \ {"file": a:wav_file, "commands": a:commands})
    if has_key(l:resp, "result")
        return l:resp.result
    endif
    echoerr "whisper: " .. string(get(l:resp, "error", "no reply"))
    return {}
endfunc
