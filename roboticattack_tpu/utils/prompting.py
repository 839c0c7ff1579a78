"""Prompt construction + tokenizer protocol.

`PurePromptBuilder` reproduces the exact strings of the reference
(/root/reference/prismatic/models/backbones/llm/prompting/base_prompter.py:28-73):
human turns wrap as ``"In: {msg}\nOut: "``, gpt turns as ``"{msg}</s>"`` (empty
messages become a single space), and the leading ``<s>`` is stripped because the
tokenizer re-adds BOS.

Because this machine has no Llama SentencePiece model, text tokenization is an
injected dependency (`TextTokenizer` protocol):
  * `HFTokenizerAdapter` wraps a HuggingFace tokenizer when a checkpoint with a
    tokenizer is available (production path).
  * `WordStubTokenizer` is a deterministic hash-based stand-in used by tests and
    synthetic pipelines; it preserves every property the attack math relies on
    (BOS first, ids < ACTION_TOKEN_BEGIN_IDX for text, trailing
    EMPTY_TOKEN_ID after "Out:").

Action tokens never pass through the text tokenizer here — they're appended as
arithmetic ids (see utils/action_tokenizer.py), which is id-identical to the
reference's decode/re-tokenize round trip.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import List, Optional, Protocol, Sequence

import numpy as np

from .action_tokenizer import encode_actions_np
from .constants import (
    BOS_TOKEN_ID,
    EMPTY_TOKEN_ID,
    EOS_TOKEN_ID,
    IGNORE_INDEX,
)


class TextTokenizer(Protocol):
    def encode(self, text: str, add_bos: bool = True) -> List[int]: ...


@dataclass
class PurePromptBuilder:
    """Multi-turn prompt accumulator with the reference's exact formatting."""

    model_family: str = "openvla"
    system_prompt: Optional[str] = None
    bos: str = "<s>"
    eos: str = "</s>"
    prompt: str = ""
    turn_count: int = 0

    def wrap_human(self, msg: str) -> str:
        return f"In: {msg}\nOut: "

    def wrap_gpt(self, msg: str) -> str:
        return f"{msg if msg != '' else ' '}{self.eos}"

    def add_turn(self, role: str, message: str) -> str:
        assert (role == "human") if (self.turn_count % 2 == 0) else (role == "gpt")
        message = message.replace("<image>", "").strip()
        wrapped = self.wrap_human(message) if self.turn_count % 2 == 0 else self.wrap_gpt(message)
        self.prompt += wrapped
        self.turn_count += 1
        return wrapped

    def get_potential_prompt(self, message: str) -> str:
        return (self.prompt + self.wrap_human(message)).removeprefix(self.bos).rstrip()

    def get_prompt(self) -> str:
        return self.prompt.removeprefix(self.bos).rstrip()


@dataclass
class VicunaV15ChatPromptBuilder(PurePromptBuilder):
    """Vicuna-v1.5 chat format (vicuna_v15_prompter.py:26-80): system prompt
    prepended on the first human turn; "USER: ... ASSISTANT: " wrapping."""

    SYS_PROMPT = (
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions."
    )

    def __post_init__(self):
        if self.system_prompt is None:
            self.system_prompt = self.SYS_PROMPT
        self.system_prompt = self.system_prompt.strip() + " "

    def wrap_human(self, msg: str) -> str:
        return f"USER: {msg} ASSISTANT: "

    def add_turn(self, role: str, message: str) -> str:
        assert (role == "human") if (self.turn_count % 2 == 0) else (role == "gpt")
        message = message.replace("<image>", "").strip()
        if self.turn_count == 0:
            wrapped = self.system_prompt + self.wrap_human(message)
        elif self.turn_count % 2 == 0:
            wrapped = self.wrap_human(message)
        else:
            wrapped = self.wrap_gpt(message)
        self.prompt += wrapped
        self.turn_count += 1
        return wrapped


@dataclass
class LLaMa2ChatPromptBuilder(PurePromptBuilder):
    """Llama-2 chat format (llama2_chat_prompter.py): [INST]/<<SYS>> wrapping,
    system prompt folded into the first human turn."""

    SYS_PROMPT = (
        "You are a helpful language and vision assistant. "
        "You are able to understand the visual content that the user provides, "
        "and assist the user with a variety of tasks using natural language."
    )

    def __post_init__(self):
        if self.system_prompt is None:
            self.system_prompt = self.SYS_PROMPT
        self.system_prompt = f"<<SYS>\n{self.system_prompt.strip()}\n<</SYS>>\n\n"

    def wrap_human(self, msg: str) -> str:
        return f"[INST] {msg} [/INST] "

    def add_turn(self, role: str, message: str) -> str:
        assert (role == "human") if (self.turn_count % 2 == 0) else (role == "gpt")
        message = message.replace("<image>", "").strip()
        if self.turn_count == 0:
            wrapped = self.wrap_human(self.system_prompt + message)
        elif self.turn_count % 2 == 0:
            wrapped = self.wrap_human(message)
        else:
            wrapped = self.wrap_gpt(message)
        self.prompt += wrapped
        self.turn_count += 1
        return wrapped


@dataclass
class MistralInstructPromptBuilder(PurePromptBuilder):
    """Mistral-Instruct format (mistral_instruct_prompter.py): [INST] wrapping,
    no system prompt."""

    def wrap_human(self, msg: str) -> str:
        return f"[INST] {msg} [/INST] "


@dataclass
class PhiPromptBuilder(PurePromptBuilder):
    """Phi-2 Input/Output format (phi_prompter.py): CodeGen tokenizer adds no
    special tokens, so BOS/EOS are spelled out in the text."""

    bos: str = "<|endoftext|>"
    eos: str = "<|endoftext|>"

    def wrap_human(self, msg: str) -> str:
        return f"Input: {msg}\nOutput: "

    def wrap_gpt(self, msg: str) -> str:
        return f"{msg if msg != '' else ' '}\n{self.eos}"

    def add_turn(self, role: str, message: str) -> str:
        assert (role == "human") if (self.turn_count % 2 == 0) else (role == "gpt")
        message = message.replace("<image>", "").strip()
        if self.turn_count == 0:
            wrapped = f"{self.bos}{self.wrap_human(message)}"
        elif self.turn_count % 2 == 0:
            wrapped = self.wrap_human(message)
        else:
            wrapped = self.wrap_gpt(message)
        self.prompt += wrapped
        self.turn_count += 1
        return wrapped


# llm_backbone_id -> prompt builder class (models/materialize.py contract)
PROMPT_BUILDERS = {
    "llama2-7b-pure": PurePromptBuilder,
    "llama2-13b-pure": PurePromptBuilder,
    "llama2-7b-chat": LLaMa2ChatPromptBuilder,
    "llama2-13b-chat": LLaMa2ChatPromptBuilder,
    "vicuna-v15-7b": VicunaV15ChatPromptBuilder,
    "vicuna-v15-13b": VicunaV15ChatPromptBuilder,
    "mistral-v0.1-7b-pure": PurePromptBuilder,
    "mistral-v0.1-7b-instruct": MistralInstructPromptBuilder,
    "phi-2-3b": PhiPromptBuilder,
}


def vla_prompt(instruction: str) -> str:
    """The single-turn human prompt used everywhere in the attack + eval paths
    (RLDSBatchTransform.py:29; experiments/robot/openvla_utils.py:163)."""
    return f"What action should the robot take to {instruction.lower()}?"


class HFTokenizerAdapter:
    """Wraps a HuggingFace PreTrainedTokenizer (production path)."""

    def __init__(self, hf_tokenizer):
        self._tok = hf_tokenizer

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        return list(self._tok(text, add_special_tokens=add_bos).input_ids)


@dataclass
class WordStubTokenizer:
    """Deterministic hash tokenizer for tests / synthetic data.

    Splits on whitespace; each word maps stably into [100, text_vocab_limit).
    Emits BOS first and EMPTY_TOKEN_ID for a trailing bare space (mimicking
    SentencePiece's behavior after "Out: "), so prompt/label geometry matches
    the real pipeline.
    """

    text_vocab_limit: int = 31000
    _cache: dict = field(default_factory=dict)

    def _word_id(self, word: str) -> int:
        if word not in self._cache:
            h = int.from_bytes(hashlib.sha1(word.encode()).digest()[:4], "little")
            self._cache[word] = 100 + h % (self.text_vocab_limit - 100)
        return self._cache[word]

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids: List[int] = [BOS_TOKEN_ID] if add_bos else []
        trailing_space = text.endswith(" ")
        for word in text.split():
            ids.append(self._word_id(word))
        if trailing_space or text.endswith(":"):
            ids.append(EMPTY_TOKEN_ID)
        return ids


def build_vla_example(
    instruction: str,
    action: np.ndarray,
    tokenizer: TextTokenizer,
    predict_stop_token: bool = True,
):
    """Tokenized (input_ids, labels) for one frame, mirroring
    VLAAttacker/white_patch/RLDSBatchTransform.py:20-49.

    The full sequence is
        [BOS] <prompt tokens...> <7 action tokens> [EOS]
    and labels ignore everything but the final ``action_dim + 1`` tokens.
    """
    action = np.asarray(action, dtype=np.float64)
    builder = PurePromptBuilder("openvla")
    builder.add_turn("human", vla_prompt(instruction))
    # gpt turn is the action token text; we tokenize the human half and append
    # arithmetic action ids + EOS, which matches the reference's ids exactly.
    prompt_text = builder.prompt  # ends with "Out: "
    prompt_ids = tokenizer.encode(prompt_text.removeprefix(builder.bos), add_bos=True)
    action_ids = encode_actions_np(action).tolist()
    input_ids = prompt_ids + action_ids + [EOS_TOKEN_ID]

    labels = np.asarray(input_ids, dtype=np.int32).copy()
    labels[: -(action.shape[0] + 1)] = IGNORE_INDEX
    if not predict_stop_token:
        labels[-1] = IGNORE_INDEX
    return np.asarray(input_ids, dtype=np.int32), labels


def pad_batch(
    sequences: Sequence[np.ndarray],
    pad_value: int,
    max_length: Optional[int] = None,
) -> np.ndarray:
    """Right-pad variable-length id sequences into a dense [B, L] array
    (PaddedCollatorForActionPrediction semantics, prismatic/util/data_utils.py:112-119)."""
    longest = max(len(s) for s in sequences)
    length = longest if max_length is None else min(longest, max_length)
    out = np.full((len(sequences), length), pad_value, dtype=np.int32)
    for i, seq in enumerate(sequences):
        seq = np.asarray(seq)[:length]
        out[i, : len(seq)] = seq
    return out
