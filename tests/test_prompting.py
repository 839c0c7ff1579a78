import numpy as np

from roboticattack_tpu.utils import PurePromptBuilder, WordStubTokenizer, build_vla_example, vla_prompt
from roboticattack_tpu.utils.constants import EMPTY_TOKEN_ID, EOS_TOKEN_ID, IGNORE_INDEX


def test_pure_prompt_builder_strings():
    pb = PurePromptBuilder("openvla")
    pb.add_turn("human", "What action should the robot take to pick up the cup?")
    pb.add_turn("gpt", "TOKENS")
    assert pb.prompt == "In: What action should the robot take to pick up the cup?\nOut: TOKENS</s>"
    assert pb.get_prompt() == pb.prompt.rstrip()

    pb2 = PurePromptBuilder("openvla")
    pb2.add_turn("human", "do <image> the thing")
    assert pb2.prompt == "In: do  the thing\nOut: "  # <image> stripped, outer strip only

    pb3 = PurePromptBuilder("openvla")
    pb3.add_turn("human", "x")
    pb3.add_turn("gpt", "")
    assert pb3.prompt.endswith(" </s>")  # empty gpt message becomes single space


def test_vla_prompt_lowercases():
    assert vla_prompt("Pick UP the Cup") == "What action should the robot take to pick up the cup?"


def test_build_vla_example_structure():
    tok = WordStubTokenizer()
    action = np.array([0.1, -0.2, 0.3, 0.0, 0.5, -0.5, 1.0])
    ids, labels = build_vla_example("stack the blocks", action, tok)
    assert ids[0] == 1
    assert ids[-1] == EOS_TOKEN_ID
    # "Out: " tail produces the empty token right before the action ids
    assert ids[-9] == EMPTY_TOKEN_ID
    assert (labels[:-8] == IGNORE_INDEX).all()
    assert (labels[-8:] == ids[-8:]).all()

    ids2, labels2 = build_vla_example("stack the blocks", action, tok, predict_stop_token=False)
    assert labels2[-1] == IGNORE_INDEX
    assert (ids2 == ids).all()


def test_stub_tokenizer_determinism():
    t1, t2 = WordStubTokenizer(), WordStubTokenizer()
    assert t1.encode("close the drawer") == t2.encode("close the drawer")
    assert all(i < 31744 for i in t1.encode("close the drawer"))
