"""Trained character-n-gram language identification — the in-repo
upgrade of the wordlist stand-in toward a fastText-class artifact
(reference ancestor: nlp_analyzer.py:887-900 langdetect per call).

No network in this sandbox, so the model is TRAINED HERE, fastText
style in miniature: a multinomial Naive Bayes over character trigrams
(fastText's own langid baseline is char-ngram features + a linear
layer; with a softmax over bag-of-ngram log-counts the NB form is the
closed-form cousin), fit on a deterministic synthetic multilingual
corpus built from committed common-word pools for 51 languages.

 - TRAINING is a distributed aggregation (explode char n-grams ->
   groupBy (lang, gram) counts) — one shuffle, map-side combined, the
   same plan shape as plans/lm.train_trigram_counts.
 - The ARTIFACT (gzip json, min_count-pruned with a max_rows
   fail-fast, KenLM-style) ships via SparkContext.addFile and loads
   once per worker inside the iterator pandas UDF
   (plans/udfs.langid_udf -> models.load_langid_model, which
   dispatches on the format string). The loaded model is deliberately
   non-picklable, like every model handle in this repo.
 - CONFIDENCE is calibrated: the length-normalized posterior is
   binned against empirical accuracy on a MIXED calibration corpus
   (trained function words + ~30% vocabulary the training split never
   saw — the deployment-faithful regime), so
   ``predict_with_confidence`` returns P(correct) estimates a
   downstream keep/drop rule can threshold honestly.
 - A uniform-background ``und`` class makes the model ABSTAIN on
   out-of-distribution text (gibberish, bare punctuation, untrained
   scripts) instead of emitting a confident wrong label.

Held-out evaluation is generalization-shaped on purpose: each
language's word pool is split train/held-out by md5 rank; the
adversarial gate in tests/test_langid.py scores sentences built ONLY
from held-out words (char-ngram transfer to unseen vocabulary, no
memorization) — noting that for mutually-intelligible pairs that
regime is genuinely ambiguous (sv's held-out words include 'de det
kan hos', all fluent Danish), so the adversarial floor is lower than
the mixed-regime gate by construction.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import math
import re

import numpy as np

__all__ = [
    "LANGID_WORDS",
    "LANGID_LANGS",
    "CHARNGRAM_FORMAT",
    "split_words",
    "sentences",
    "corpus_df",
    "train_charngram_counts",
    "write_charngram_langid",
    "load_charngram_langid",
    "calibrate",
    "train_langid_artifact",
    "CharNgramLangID",
]

CHARNGRAM_FORMAT = "dqs-langid-charngram-v1"

# the engine tokenization/whitespace contract (Java \s, NOT Python
# unicode \s — see plans/udfs.py): normalization must agree between
# the Spark training expression and the Python scorer
_WS = re.compile(r"[ \t\n\x0b\f\r]+")

# Committed common-word pools, ~40 words per language, native scripts.
# Function words + numerals + high-frequency nouns: the vocabulary
# whose character shapes carry each language's trigram signature.
# (Public-knowledge word frequency lists; no external data.)
LANGID_WORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "and", "of", "to", "in", "is", "was", "for", "with",
        "that", "this", "from", "not", "are", "but", "they", "have",
        "you", "all", "one", "time", "what", "when", "which", "there",
        "would", "make", "like", "people", "year", "day", "good",
        "new", "our", "out", "about", "them", "can", "will", "just",
    ),
    "es": (
        "el", "la", "los", "las", "una", "es", "en", "para", "con",
        "que", "pero", "son", "sobre", "más", "usted", "nosotros",
        "ellos", "ser", "tener", "hace", "como", "todo", "también",
        "bien", "su", "esta", "están", "muy", "dos", "tiempo", "día",
        "mundo", "sin", "puede", "aún", "donde", "después", "mismo",
        "entre", "años",
    ),
    "fr": (
        "le", "la", "les", "des", "une", "est", "dans", "pour",
        "avec", "que", "mais", "pas", "sur", "plus", "vous", "nous",
        "ils", "être", "avoir", "fait", "comme", "tout", "aussi",
        "bien", "leur", "cette", "sont", "très", "deux", "temps",
        "jour", "monde", "sans", "peut", "encore", "où", "après",
        "même", "entre", "ans",
    ),
    "de": (
        "der", "die", "das", "und", "ist", "war", "für", "mit",
        "dass", "nicht", "sind", "aber", "sie", "haben", "ein",
        "eine", "von", "auf", "als", "auch", "nach", "wie", "wir",
        "ihr", "werden", "kann", "mehr", "schon", "zeit", "jahr",
        "gut", "neue", "durch", "wenn", "nur", "noch", "über",
        "diese", "beim", "welt",
    ),
    "it": (
        "il", "la", "gli", "le", "una", "è", "che", "per", "con",
        "non", "sono", "ma", "anche", "come", "tutto", "bene",
        "questa", "molto", "due", "tempo", "giorno", "mondo", "senza",
        "può", "ancora", "dove", "dopo", "stesso", "tra", "loro",
        "essere", "avere", "fatto", "più", "voi", "noi", "della",
        "nella", "anni", "quando",
    ),
    "pt": (
        "o", "a", "os", "as", "uma", "é", "que", "para", "com",
        "não", "são", "mas", "também", "como", "tudo", "bem", "esta",
        "muito", "dois", "tempo", "dia", "mundo", "sem", "pode",
        "ainda", "onde", "depois", "mesmo", "entre", "eles", "ser",
        "ter", "feito", "mais", "vocês", "nós", "da", "na", "pela",
        "anos",
    ),
    "nl": (
        "de", "het", "een", "en", "is", "was", "voor", "met", "dat",
        "niet", "zijn", "maar", "zij", "hebben", "van", "op", "als",
        "ook", "naar", "hoe", "wij", "jullie", "worden", "kan",
        "meer", "al", "tijd", "jaar", "goed", "nieuwe", "door",
        "wanneer", "alleen", "nog", "over", "deze", "bij", "uit",
        "geen", "wereld",
    ),
    "sv": (
        "och", "att", "det", "är", "var", "för", "med", "inte",
        "den", "de", "men", "har", "från", "på", "som", "också",
        "hur", "vi", "ni", "kan", "mer", "redan", "tid", "år", "bra",
        "nya", "genom", "när", "bara", "ännu", "över", "denna",
        "hos", "ut", "ingen", "mycket", "två", "dag", "värld",
        "efter",
    ),
    "da": (
        "og", "at", "det", "er", "var", "for", "med", "ikke", "den",
        "de", "men", "har", "fra", "på", "som", "også", "hvordan",
        "vi", "kan", "mere", "allerede", "tid", "år", "god", "nye",
        "gennem", "når", "kun", "endnu", "over", "denne", "hos",
        "ud", "ingen", "meget", "to", "dag", "verden", "efter",
        "hvad",
    ),
    "fi": (
        "ja", "että", "se", "on", "oli", "ei", "mutta", "hän",
        "ovat", "olla", "kanssa", "myös", "kuinka", "me", "te",
        "voi", "enemmän", "jo", "aika", "vuosi", "hyvä", "uusi",
        "kautta", "kun", "vain", "vielä", "yli", "tämä", "luona",
        "ulos", "paljon", "kaksi", "päivä", "maailma", "jälkeen",
        "mitä", "kuka", "missä", "niin", "koska",
    ),
    "pl": (
        "i", "że", "to", "jest", "był", "nie", "ale", "oni", "mają",
        "z", "na", "jak", "również", "my", "wy", "może", "więcej",
        "już", "czas", "rok", "dobry", "nowy", "przez", "kiedy",
        "tylko", "jeszcze", "nad", "ta", "przy", "bardzo", "dwa",
        "dzień", "świat", "po", "co", "kto", "gdzie", "tak", "dla",
        "się",
    ),
    "cs": (
        "a", "že", "to", "je", "byl", "ne", "ale", "oni", "mají",
        "s", "na", "jak", "také", "my", "vy", "může", "více", "už",
        "čas", "rok", "dobrý", "nový", "přes", "když", "jen",
        "ještě", "nad", "tato", "při", "velmi", "dva", "den", "svět",
        "po", "co", "kdo", "kde", "tak", "pro", "se",
    ),
    "ro": (
        "și", "că", "este", "era", "nu", "dar", "ei", "au", "cu",
        "pe", "cum", "de", "asemenea", "noi", "voi", "poate", "mai",
        "deja", "timp", "an", "bun", "nou", "prin", "când", "doar",
        "încă", "peste", "această", "la", "foarte", "două", "zi",
        "lume", "după", "ce", "cine", "unde", "așa", "pentru",
        "acest",
    ),
    "hu": (
        "és", "hogy", "ez", "van", "volt", "nem", "de", "ők",
        "vannak", "vele", "is", "hogyan", "mi", "ti", "lehet",
        "több", "már", "idő", "év", "jó", "új", "által", "amikor",
        "csak", "még", "felett", "ennél", "nagyon", "két", "nap",
        "világ", "után", "mit", "ki", "hol", "így", "ezért", "az",
        "egy", "mert",
    ),
    "tr": (
        "ve", "bu", "bir", "için", "ile", "değil", "ama", "onlar",
        "var", "olmak", "da", "nasıl", "biz", "siz", "olabilir",
        "daha", "zaten", "zaman", "yıl", "iyi", "yeni", "tarafından",
        "sadece", "henüz", "üzerinde", "çok", "iki", "gün", "dünya",
        "sonra", "ne", "kim", "nerede", "böyle", "çünkü", "o", "ben",
        "sen", "onun", "kadar",
    ),
    "id": (
        "dan", "ini", "adalah", "untuk", "dengan", "tidak", "tetapi",
        "mereka", "ada", "menjadi", "juga", "bagaimana", "kami",
        "kalian", "bisa", "lebih", "sudah", "waktu", "tahun", "baik",
        "baru", "oleh", "ketika", "hanya", "masih", "atas", "sangat",
        "dua", "hari", "dunia", "setelah", "apa", "siapa", "dimana",
        "jadi", "karena", "itu", "saya", "kamu", "yang",
    ),
    "vi": (
        "và", "này", "là", "cho", "với", "không", "nhưng", "họ",
        "có", "trở", "cũng", "làm", "chúng", "bạn", "thể", "hơn",
        "đã", "thời", "năm", "tốt", "mới", "bởi", "khi", "chỉ",
        "còn", "trên", "rất", "hai", "ngày", "giới", "sau", "gì",
        "ai", "đâu", "vậy", "vì", "đó", "tôi", "của", "một",
    ),
    "ru": (
        "и", "что", "это", "есть", "был", "не", "но", "они",
        "имеют", "с", "на", "как", "также", "мы", "вы", "может",
        "больше", "уже", "время", "год", "хороший", "новый",
        "через", "когда", "только", "ещё", "над", "эта", "при",
        "очень", "два", "день", "мир", "после", "кто", "где", "так",
        "для", "себя", "его",
    ),
    "uk": (
        "і", "що", "це", "є", "був", "не", "але", "вони", "мають",
        "з", "на", "як", "також", "ми", "ви", "може", "більше",
        "вже", "час", "рік", "добрий", "новий", "через", "коли",
        "тільки", "ще", "над", "ця", "при", "дуже", "два", "день",
        "світ", "після", "хто", "де", "так", "для", "себе", "його",
    ),
    "el": (
        "και", "ότι", "αυτό", "είναι", "ήταν", "δεν", "αλλά",
        "αυτοί", "έχουν", "με", "σε", "πώς", "εμείς", "εσείς",
        "μπορεί", "περισσότερο", "ήδη", "χρόνος", "έτος", "καλός",
        "νέος", "μέσω", "όταν", "μόνο", "ακόμα", "πάνω", "αυτή",
        "πολύ", "δύο", "ημέρα", "κόσμος", "μετά", "τι", "ποιος",
        "πού", "έτσι", "για", "το", "να", "από",
    ),
    "ar": (
        "في", "من", "إلى", "على", "أن", "لا", "هذا", "هذه", "كان",
        "مع", "هو", "هي", "هم", "لكن", "نحن", "أنتم", "يمكن",
        "أكثر", "قد", "وقت", "سنة", "جيد", "جديد", "عبر", "عندما",
        "فقط", "بعد", "فوق", "جدا", "يوم", "عالم", "ما", "الذي",
        "أين", "هكذا", "لأن", "ذلك", "أنا", "كل", "عن",
    ),
    "he": (
        "של", "את", "על", "אל", "כי", "לא", "זה", "זאת", "היה",
        "עם", "הוא", "היא", "הם", "אבל", "אנחנו", "אתם", "יכול",
        "יותר", "כבר", "זמן", "שנה", "טוב", "חדש", "דרך", "כאשר",
        "רק", "עוד", "מעל", "מאוד", "יום", "עולם", "אחרי", "מה",
        "מי", "איפה", "כך", "בגלל", "הזה", "אני", "גם",
    ),
    "hi": (
        "और", "यह", "है", "के", "लिए", "से", "नहीं", "लेकिन", "वे",
        "हैं", "साथ", "वह", "कैसे", "हम", "आप", "सकता", "अधिक",
        "पहले", "समय", "साल", "अच्छा", "नया", "द्वारा", "जब",
        "केवल", "अभी", "ऊपर", "बहुत", "दो", "दिन", "दुनिया", "बाद",
        "क्या", "कौन", "कहाँ", "ऐसा", "क्योंकि", "मैं", "का", "में",
    ),
    "ja": (
        "これ", "それ", "です", "ます", "した", "ない", "しかし",
        "彼ら", "ある", "なる", "また", "どう", "私たち", "あなた",
        "できる", "もっと", "すでに", "時間", "年", "良い",
        "新しい", "によって", "とき", "だけ", "まだ", "上",
        "とても", "二", "日", "世界", "後", "何", "誰", "どこ",
        "そう", "なぜ", "その", "わたし", "もの", "こと",
    ),
    "ko": (
        "그리고", "이것", "입니다", "했다", "없다", "그러나",
        "그들", "있다", "되다", "또한", "어떻게", "우리", "당신",
        "수", "더", "이미", "시간", "년", "좋은", "새로운", "통해",
        "때", "만", "아직", "위", "매우", "두", "날", "세계", "후",
        "무엇", "누구", "어디", "그래서", "왜", "그", "나", "의",
        "것", "사람",
    ),
    "zh": (
        "的", "是", "在", "了", "不", "和", "有", "我", "他", "这",
        "中", "大", "来", "上", "国", "个", "到", "说", "们", "为",
        "子", "你", "地", "出", "道", "也", "时", "年", "得", "就",
        "那", "要", "下", "以", "生", "会", "自", "着", "去", "人",
    ),
    # round-6 expansion: +12 languages. Five unique scripts (th bn ta
    # te ka) ride free on trigram separation; fa shares Arabic script
    # with ar but disjoint function words; sw/bg/hr/lt/lv/az stress
    # the confusable-neighbor regime (bg vs ru/uk Cyrillic, hr vs
    # cs/pl Latin-Slavic, az vs tr Turkic) — the held-out gates keep
    # them honest.
    "th": (
        "ที่", "และ", "เป็น", "ใน", "ของ", "มี", "ไม่", "ได้",
        "ให้", "ว่า", "จะ", "มา", "ไป", "กับ", "แต่", "ก็", "นี้",
        "นั้น", "คน", "เรา", "คุณ", "เขา", "อยู่", "ต้อง",
        "เมื่อ", "แล้ว", "ถ้า", "เพราะ", "อย่าง", "ทำ", "วัน",
        "เวลา", "ปี", "ดี", "ใหม่", "โลก", "หลัง", "อะไร",
        "ใคร", "ที่ไหน",
    ),
    "bn": (
        "এবং", "আমি", "তুমি", "সে", "আমরা", "তারা", "এই", "সেই",
        "হয়", "ছিল", "না", "কিন্তু", "থেকে", "জন্য", "সঙ্গে",
        "করে", "বলে", "সব", "এক", "সময়", "বছর", "দিন", "ভালো",
        "নতুন", "মানুষ", "পরে", "কি", "কে", "কোথায়", "তাই",
        "কেন", "আর", "হবে", "পারে", "আরো", "এখন", "যখন",
        "মধ্যে", "উপর", "কিছু",
    ),
    "ta": (
        "மற்றும்", "நான்", "நீ", "அவன்", "அவள்", "நாங்கள்",
        "அவர்கள்", "இது", "அது", "இருக்கிறது", "இல்லை",
        "ஆனால்", "இருந்து", "உடன்", "செய்ய", "என்று",
        "எல்லாம்", "ஒரு", "நேரம்", "ஆண்டு", "நாள்", "நல்ல",
        "புதிய", "மக்கள்", "பிறகு", "என்ன", "யார்", "எங்கே",
        "அதனால்", "ஏன்", "மேலும்", "இப்போது", "போது",
        "நடுவில்", "மேல்", "சில", "மிகவும்", "இரண்டு",
        "உலகம்", "வேண்டும்",
    ),
    "te": (
        "మరియు", "నేను", "నీవు", "అతను", "ఆమె", "మేము", "వారు",
        "ఇది", "అది", "ఉంది", "లేదు", "కానీ", "నుండి", "కోసం",
        "తో", "చేయు", "అని", "అన్ని", "ఒక", "సమయం",
        "సంవత్సరం", "రోజు", "మంచి", "కొత్త", "ప్రజలు",
        "తరువాత", "ఏమి", "ఎవరు", "ఎక్కడ", "కాబట్టి", "ఎందుకు",
        "ఇంకా", "ఇప్పుడు", "ఉన్నప్పుడు", "మధ్య", "పైన",
        "కొన్ని", "చాలా", "రెండు", "ప్రపంచం",
    ),
    "ka": (
        "და", "არის", "იყო", "არ", "მაგრამ", "ისინი", "აქვს",
        "შენ", "ჩვენ", "ყველა", "ერთი", "დრო", "წელი", "დღე",
        "კარგი", "ახალი", "ჩვენი", "შესახებ", "მათ",
        "შეუძლია", "იქნება", "მხოლოდ", "ადამიანები", "როცა",
        "რომელიც", "იქ", "გააკეთოს", "მოსწონს", "რა", "როდის",
        "სად", "ასე", "რატომ", "კიდევ", "ახლა", "შორის",
        "ზემოთ", "რამდენიმე", "ძალიან", "ორი",
    ),
    "fa": (
        "است", "که", "از", "را", "با", "این", "آن", "برای",
        "در", "به", "نیست", "اما", "آنها", "دارند", "شما", "ما",
        "همه", "یک", "زمان", "سال", "روز", "خوب", "جدید",
        "مردم", "بعد", "چه", "کسی", "کجا", "پس", "چرا", "هنوز",
        "اکنون", "وقتی", "میان", "بالا", "برخی", "بسیار", "دو",
        "جهان", "باشد",
    ),
    "sw": (
        "na", "ni", "ya", "wa", "kwa", "katika", "si", "lakini",
        "wao", "kuwa", "nina", "wewe", "sisi", "wote", "moja",
        "wakati", "mwaka", "siku", "nzuri", "mpya", "watu",
        "baada", "nini", "nani", "wapi", "hivyo", "kwanini",
        "bado", "sasa", "kila", "kati", "juu", "baadhi", "sana",
        "mbili", "dunia", "kama", "hii", "ile", "yake",
    ),
    "bg": (
        "и", "е", "на", "не", "са", "но", "те", "има", "ти",
        "ние", "всички", "един", "време", "година", "ден",
        "добър", "нов", "хора", "след", "какво", "кой", "къде",
        "така", "защо", "още", "сега", "когато", "между",
        "върху", "някои", "много", "две", "свят", "като",
        "това", "онова", "който", "може", "ще", "само",
    ),
    "hr": (
        "i", "je", "na", "u", "za", "ne", "su", "ali", "oni",
        "ima", "ti", "mi", "svi", "jedan", "vrijeme", "godina",
        "dan", "dobar", "nov", "ljudi", "poslije", "što", "tko",
        "gdje", "tako", "zašto", "još", "sada", "kada", "između",
        "iznad", "neki", "vrlo", "dva", "svijet", "kao", "ovaj",
        "onaj", "koji", "može",
    ),
    "lt": (
        "ir", "yra", "buvo", "ne", "bet", "jie", "turi", "tu",
        "mes", "visi", "vienas", "laikas", "metai", "diena",
        "geras", "naujas", "žmonės", "po", "kas", "kur", "taip",
        "kodėl", "dar", "dabar", "kai", "tarp", "virš", "kurie",
        "labai", "du", "pasaulis", "kaip", "šis", "tas", "kuris",
        "gali", "bus", "tik", "apie", "jau",
    ),
    "lv": (
        "un", "ir", "bija", "ne", "bet", "viņi", "tu", "mēs",
        "visi", "viens", "laiks", "gads", "diena", "labs",
        "jauns", "cilvēki", "pēc", "kas", "kur", "tā", "kāpēc",
        "vēl", "tagad", "kad", "starp", "virs", "daži", "ļoti",
        "divi", "pasaule", "kā", "šis", "tas", "kurš", "var",
        "būs", "tikai", "par", "jau", "arī",
    ),
    "az": (
        "və", "bir", "bu", "o", "biz", "siz", "onlar", "üçün",
        "ilə", "amma", "deyil", "var", "yox", "hamı", "zaman",
        "il", "gün", "yaxşı", "yeni", "insanlar", "sonra", "nə",
        "kim", "harada", "görə", "niyə", "hələ", "indi", "vaxt",
        "arasında", "üstündə", "bəzi", "çox", "iki", "dünya",
        "kimi", "həmin", "hansı", "olar", "edir",
    ),
    "is": (
        "og", "að", "er", "það", "ekki", "við", "hann", "hún",
        "þetta", "sem", "fyrir", "með", "var", "eru", "hafa",
        "vera", "ég", "þú", "þeir", "hér", "þar", "núna", "dagur",
        "tími", "ár", "heimur", "góður", "nýr", "mikið", "bara",
        "líka", "eftir", "undir", "yfir", "milli", "okkar",
        "hvað", "hvernig", "aldrei", "alltaf",
    ),
    "eu": (
        "eta", "da", "ez", "bai", "hau", "hori", "bat", "bi",
        "egun", "urte", "denbora", "mundua", "etxea", "herria",
        "baina", "ere", "oso", "ongi", "gero", "orain", "hemen",
        "han", "nola", "zer", "nor", "guztiak", "berria",
        "handia", "txikia", "egin", "izan", "dago", "dira",
        "zen", "dute", "dugu", "nahi", "behar", "gizona", "ura",
    ),
    "et": (
        "ja", "on", "ei", "see", "ta", "me", "te", "nad", "oli",
        "olen", "oleme", "aga", "ka", "väga", "hästi", "nüüd",
        "siin", "seal", "kuidas", "mis", "kes", "kõik", "uus",
        "suur", "väike", "teha", "olla", "aeg", "päev", "aasta",
        "maailm", "ilma", "võib", "veel", "kus", "pärast",
        "sama", "vahel", "palju", "mitte",
    ),
    "ml": (
        "ആണ്", "അല്ല", "ഒരു", "ഞാൻ", "നീ", "അവൻ", "അവൾ", "നമ്മൾ",
        "അവർ", "ഇത്", "അത്", "എന്ത്", "എങ്ങനെ", "എവിടെ",
        "എപ്പോൾ", "നല്ല", "വലിയ", "ചെറിയ", "പുതിയ", "സമയം",
        "ദിവസം", "വർഷം", "ലോകം", "വീട്", "വെള്ളം", "പക്ഷേ",
        "വളരെ", "ഇപ്പോൾ", "പിന്നെ", "മുമ്പ്", "ഇവിടെ", "അവിടെ",
        "എല്ലാം", "കൂടെ", "വേണം", "ഉണ്ട്", "ഇല്ല", "ചെയ്യുക",
        "പറഞ്ഞു", "കാണുക",
    ),
    "kn": (
        "ಮತ್ತು", "ಒಂದು", "ನಾನು", "ನೀನು", "ಅವನು", "ಅವಳು", "ನಾವು",
        "ಅವರು", "ಇದು", "ಅದು", "ಏನು", "ಹೇಗೆ", "ಎಲ್ಲಿ", "ಯಾವಾಗ",
        "ಒಳ್ಳೆಯ", "ದೊಡ್ಡ", "ಚಿಕ್ಕ", "ಹೊಸ", "ಸಮಯ", "ದಿನ", "ವರ್ಷ",
        "ಜಗತ್ತು", "ಮನೆ", "ನೀರು", "ಆದರೆ", "ತುಂಬಾ", "ಈಗ", "ನಂತರ",
        "ಮೊದಲು", "ಇಲ್ಲಿ", "ಅಲ್ಲಿ", "ಎಲ್ಲಾ", "ಜೊತೆ", "ಬೇಕು",
        "ಇದೆ", "ಇಲ್ಲ", "ಮಾಡು", "ಹೇಳಿದರು", "ನೋಡು", "ಬರು",
    ),
    "gu": (
        "અને", "એક", "હું", "તું", "તે", "અમે", "તેઓ", "આ", "શું",
        "કેવી", "ક્યાં", "ક્યારે", "સારું", "મોટું", "નાનું",
        "નવું", "સમય", "દિવસ", "વર્ષ", "દુનિયા", "ઘર", "પાણી",
        "પણ", "ખૂબ", "હવે", "પછી", "પહેલા", "અહીં", "ત્યાં",
        "બધા", "સાથે", "જોઈએ", "છે", "નથી", "કરવું", "કહ્યું",
        "જોવું", "આવવું", "જવું", "હતું",
    ),
    "pa": (
        "ਅਤੇ", "ਇੱਕ", "ਮੈਂ", "ਤੂੰ", "ਉਹ", "ਅਸੀਂ", "ਇਹ", "ਕੀ",
        "ਕਿਵੇਂ", "ਕਿੱਥੇ", "ਕਦੋਂ", "ਚੰਗਾ", "ਵੱਡਾ", "ਛੋਟਾ",
        "ਨਵਾਂ", "ਸਮਾਂ", "ਦਿਨ", "ਸਾਲ", "ਦੁਨੀਆ", "ਘਰ", "ਪਾਣੀ",
        "ਪਰ", "ਬਹੁਤ", "ਹੁਣ", "ਬਾਅਦ", "ਪਹਿਲਾਂ", "ਇੱਥੇ", "ਉੱਥੇ",
        "ਸਾਰੇ", "ਨਾਲ", "ਚਾਹੀਦਾ", "ਹੈ", "ਨਹੀਂ", "ਕਰਨਾ", "ਕਿਹਾ",
        "ਵੇਖਣਾ", "ਆਉਣਾ", "ਜਾਣਾ", "ਸੀ", "ਹਨ",
    ),
    "si": (
        "සහ", "එක", "මම", "ඔබ", "ඔහු", "ඇය", "අපි", "ඔවුන්",
        "මේ", "ඒ", "මොකද", "කොහොමද", "කොහෙද", "කවදාද", "හොඳ",
        "ලොකු", "පොඩි", "අලුත්", "කාලය", "දවස", "අවුරුද්ද",
        "ලෝකය", "ගෙදර", "වතුර", "නමුත්", "ගොඩක්", "දැන්",
        "පස්සේ", "කලින්", "මෙතන", "එතන", "ඔක්කොම", "එක්ක",
        "ඕනේ", "තියෙනවා", "නැහැ", "කරනවා", "කිව්වා", "බලනවා",
        "එනවා",
    ),
    "my": (
        "နှင့်", "တစ်", "ငါ", "သင်", "သူ", "ကျွန်တော်", "ဒီ",
        "ဟို", "ဘာ", "ဘယ်လို", "ဘယ်မှာ", "ဘယ်တော့", "ကောင်း",
        "ကြီး", "သေး", "အသစ်", "အချိန်", "နေ့", "နှစ်", "ကမ္ဘာ",
        "အိမ်", "ရေ", "ဒါပေမယ့်", "အရမ်း", "အခု", "နောက်",
        "အရင်", "ဒီမှာ", "ဟိုမှာ", "အားလုံး", "အတူ", "လို",
        "ရှိ", "မရှိ", "လုပ်", "ပြော", "ကြည့်", "လာ", "သွား",
        "ဖြစ်",
    ),
    "km": (
        "និង", "មួយ", "ខ្ញុំ", "អ្នក", "គាត់", "យើង", "ពួកគេ",
        "នេះ", "នោះ", "អ្វី", "យ៉ាងម៉េច", "ឯណា", "ពេលណា", "ល្អ",
        "ធំ", "តូច", "ថ្មី", "ពេលវេលា", "ថ្ងៃ", "ឆ្នាំ",
        "ពិភពលោក", "ផ្ទះ", "ទឹក", "ប៉ុន្តែ", "ណាស់", "ឥឡូវ",
        "ក្រោយ", "មុន", "ទីនេះ", "ទីនោះ", "ទាំងអស់", "ជាមួយ",
        "ត្រូវការ", "មាន", "គ្មាន", "ធ្វើ", "និយាយ", "មើល",
        "មក", "ទៅ",
    ),
    "am": (
        "እና", "አንድ", "እኔ", "አንተ", "እሱ", "እሷ", "እኛ", "እነሱ",
        "ይህ", "ያ", "ምን", "እንዴት", "የት", "መቼ", "ጥሩ", "ትልቅ",
        "ትንሽ", "አዲስ", "ጊዜ", "ቀን", "ዓመት", "ዓለም", "ቤት", "ውሃ",
        "ግን", "በጣም", "አሁን", "በኋላ", "በፊት", "እዚህ", "እዚያ",
        "ሁሉም", "ጋር", "ያስፈልጋል", "አለ", "የለም", "መስራት", "ማየት",
        "መምጣት", "መሄድ",
    ),
    "hy": (
        "և", "մեկ", "ես", "դու", "նա", "մենք", "նրանք", "սա",
        "դա", "ինչ", "ինչպես", "որտեղ", "երբ", "լավ", "մեծ",
        "փոքր", "նոր", "ժամանակ", "օր", "տարի", "աշխարհ", "տուն",
        "ջուր", "բայց", "շատ", "հիմա", "հետո", "առաջ", "այստեղ",
        "այնտեղ", "բոլորը", "հետ", "պետք", "կա", "չկա", "անել",
        "ասաց", "տեսնել", "գալ", "գնալ",
    ),
    "mn": (
        "ба", "нэг", "би", "чи", "тэр", "бид", "тэд", "энэ",
        "юу", "яаж", "хаана", "хэзээ", "сайн", "том", "жижиг",
        "шинэ", "цаг", "өдөр", "жил", "дэлхий", "гэр", "ус",
        "гэхдээ", "маш", "одоо", "дараа", "өмнө", "энд", "тэнд",
        "бүгд", "хамт", "хэрэгтэй", "байна", "байхгүй", "хийх",
        "гэсэн", "харах", "ирэх", "явах", "байсан",
    ),
}

LANGID_LANGS: tuple[str, ...] = tuple(LANGID_WORDS)


def split_words(
    lang: str, held_out_frac: float = 0.2
) -> tuple[tuple[str, ...], tuple[str, ...]]:
    """(train_words, held_out_words): deterministic md5-rank split of a
    language's pool — the same idiom as the repo's md5-threshold
    sampling (never rand(); stable under any iteration order). The
    held-out fraction of words is EXCLUDED from every training
    sentence, so held-out evaluation measures transfer to unseen
    vocabulary."""
    words = LANGID_WORDS[lang]
    ranked = sorted(
        words,
        key=lambda w: hashlib.md5(f"{lang}:{w}".encode()).hexdigest(),
    )
    k = max(4, int(len(ranked) * held_out_frac))
    held = tuple(sorted(ranked[:k]))
    train = tuple(sorted(ranked[k:]))
    return train, held


def sentences(
    lang: str,
    n: int,
    seed: int = 7,
    split: str = "train",
    min_len: int = 5,
    max_len: int = 12,
) -> list[str]:
    """Deterministic synthetic sentences for one language: seeded
    numpy draws over the requested word split.

    - 'train': training-vocabulary words only (the corpus the model
      fits on).
    - 'held': held-out words ONLY — deliberately adversarial. For
      mutually-intelligible pairs this can be genuinely ambiguous
      text: sv's held-out draw includes 'de det kan hos', words that
      appear verbatim in da's TRAINING pool, so an all-held sv
      sentence is also fluent Danish and no classifier can win.
    - 'mixed': ~30% held-out words, 70% training words — the
      deployment-faithful regime (real sentences are function words
      the model has seen plus some OOV content vocabulary)."""
    train, held = split_words(lang)
    pool = list(train if split == "train" else held)
    mixed = split == "mixed"
    if mixed:
        pool = list(train)
        held_l = list(held)
    # md5, not hash(): Python's str hash is salted per process
    # (PYTHONHASHSEED) and would make the corpus non-deterministic
    lang_key = int.from_bytes(
        hashlib.md5(lang.encode()).digest()[:4], "big"
    )
    rng = np.random.RandomState(
        (seed * 1_000_003 + lang_key) % (2**31 - 1)
    )
    out = []
    for _ in range(n):
        ln = min_len + rng.randint(max_len - min_len + 1)
        if mixed:
            words = [
                held_l[rng.randint(len(held_l))]
                if rng.rand() < 0.3
                else pool[rng.randint(len(pool))]
                for _ in range(ln)
            ]
        else:
            words = [pool[rng.randint(len(pool))] for _ in range(ln)]
        out.append(" ".join(words))
    return out


def corpus_df(spark, n_per_lang: int = 120, seed: int = 7, split: str = "train"):
    """The multilingual corpus as a (lang, text) DataFrame."""
    rows = [
        (lang, s)
        for lang in LANGID_LANGS
        for s in sentences(lang, n_per_lang, seed=seed, split=split)
    ]
    return spark.createDataFrame(rows, "lang string, text string")


def _norm_expr(text_col, order: int):
    """Spark normalization + char-n-gram expression; must stay in
    lockstep with CharNgramLangID._grams (parity-pinned in tests).
    Space-padded so word boundaries contribute boundary grams.

    Emits ALL orders 1..order in one bag (fastText's minn..maxn
    shape): unigrams/bigrams carry script + diacritic + digraph
    signal that generalizes to words the training pool never saw —
    with trigrams alone, held-out-word text is a bag of unseen grams
    and the NB argmax degenerates to whichever language has the
    smallest denominator (measured: 0.37 held-out accuracy; mixed
    orders: see test_langid gate)."""
    from pyspark.sql import functions as F

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(c), r"[ \t\n\x0b\f\r]+", " ")),
        F.lit(" "),
    )
    # factory closure, NOT a defaulted second lambda arg: a two-arg
    # lambda in F.transform means (element, index) — a `lambda i,
    # ln=ln:` form silently receives the array INDEX as ln and emits
    # garbage grams (caught by the parity test)
    def _slice(n):
        return lambda i: norm.substr(i, F.lit(n))

    per_order = []
    for n in range(1, order + 1):
        idx = F.sequence(F.lit(1), F.length(norm) - (n - 1))
        # guard, don't clamp: sequence(1, 0) is DESCENDING [1, 0] in
        # Spark, which would emit phantom grams for text shorter than
        # the order (the Python mirror emits none)
        per_order.append(
            F.when(
                F.length(norm) >= n, F.transform(idx, _slice(n))
            ).otherwise(F.array().cast("array<string>"))
        )
    # whole-word features (fastText: word + char n-grams): exact hits
    # on trained function words are the strongest evidence for close
    # pairs (sv 'och/att/är' vs da 'og/at/er'). Words short enough to
    # BE a char gram when padded are skipped — the sliding window
    # already emitted them (identical rule in CharNgramLangID._grams).
    words = F.filter(
        F.transform(
            F.split(F.trim(norm), " "),
            lambda w: F.concat(F.lit(" "), w, F.lit(" ")),
        ),
        lambda pw: F.length(pw) > order,
    )
    # pure-space grams (the padding 1-gram " ", and "  " from empty
    # text) are normalization artifacts with NO language signal — but
    # as the highest-count "seen" gram in every language they reward
    # real languages over the uniform 'und' background on junk input:
    # at 38 languages the vocabulary grew enough that bare punctuation
    # ("?!") out-scored abstention through its space grams alone.
    # Dropped from training and scoring alike (mirror rule in
    # CharNgramLangID._grams).
    return F.filter(
        F.concat(*per_order, words),
        lambda g: F.trim(g) != F.lit(""),
    )


def train_charngram_counts(
    df, lang_col: str = "lang", text_col: str = "text", order: int = 3
):
    """(counts_df, vocab_size): distributed char-n-gram counting —
    explode grams, ONE groupBy (lang, gram) shuffle with map-side
    combine; vocab_size = global distinct gram count (the add-one
    denominator). Same plan shape as lm.train_trigram_counts."""
    from pyspark.sql import functions as F

    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(lang_col).alias("lang"),
            F.explode(_norm_expr(text_col, order)).alias("gram"),
        )
        .persist()
    )
    counts = base.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).alias("n")
    )
    vocab = base.agg(F.countDistinct("gram")).collect()[0][0]
    counts._cached_deps = (base,)
    return counts, int(vocab or 0)


class CharNgramLangID:
    """Loaded multinomial-NB artifact: per-language add-one-smoothed
    char-n-gram log-likelihood argmax. Non-picklable by design (model
    handles ship via addFile + SparkFiles, never closure capture)."""

    def __init__(
        self,
        langs: list[str],
        counts: dict[str, dict[str, int]],
        totals: dict[str, int],
        vocab_size: int,
        order: int,
        calibration: list | None = None,
        alpha: float = 0.1,
    ):
        self.langs = list(langs)
        self.counts = counts
        self.totals = totals
        self.v = max(int(vocab_size), 1)
        self.order = int(order)
        self.calibration = calibration or []
        # add-alpha smoothing, alpha < 1: add-ONE over a ~90k mixed-
        # order gram vocabulary flattens seen-vs-unseen contrast to
        # log(c+1) - log(1) against a denominator the vocab dominates;
        # alpha=0.1 deepens the unseen penalty ~2.3 nats per gram,
        # which is what separates close pairs (sv/da, cs/pl) whose
        # MATCHED gram sets are similar (measured in test_langid gate)
        self.alpha = float(alpha)
        # precompute the per-language denominators / unseen logprob
        self._denom = {
            lg: math.log(self.totals.get(lg, 0) + self.alpha * self.v)
            for lg in self.langs
        }
        self._unseen = {
            lg: math.log(self.alpha) - self._denom[lg]
            for lg in self.langs
        }

    def __reduce__(self):
        raise TypeError(
            "CharNgramLangID is not picklable; ship the artifact with "
            "SparkContext.addFile and load it worker-side via "
            "SparkFiles.get"
        )

    def _grams(self, text: str) -> list[str]:
        # .strip(" ") everywhere, never .strip(): Spark's trim removes
        # ASCII space 0x20 only, while Python's bare strip is
        # Unicode-aware — on NBSP/ideographic-space text (common in
        # web pages, NOT folded by the ASCII _WS class) a bare strip
        # would drop grams the Catalyst training path counted,
        # breaking train/predict gram-bag parity (CLAUDE.md mirror
        # rule: pin Java's ASCII semantics)
        norm = " " + _WS.sub(" ", text.lower()).strip(" ") + " "
        out = []
        for n in range(1, self.order + 1):
            out.extend(
                norm[i : i + n]
                for i in range(max(len(norm) - n + 1, 0))
            )
        # whole-word features, mirroring _norm_expr's rule exactly
        out.extend(
            pw
            for w in norm.strip(" ").split(" ")
            if w and len(pw := f" {w} ") > self.order
        )
        # mirror of _norm_expr's pure-space filter: padding grams are
        # signal-free and would reward every real language over 'und'
        # on punctuation-only input
        return [g for g in out if g.strip(" ")]

    def _scores(self, grams: list[str]) -> dict[str, float]:
        out = {}
        for lg in self.langs:
            table = self.counts.get(lg, {})
            denom = self._denom[lg]
            unseen = self._unseen[lg]
            a = self.alpha
            s = 0.0
            for g in grams:
                c = table.get(g)
                s += math.log(c + a) - denom if c else unseen
            out[lg] = s
        # uniform-background "und" class: p(g) = 1/V for every gram.
        # Out-of-distribution text (gibberish, bare punctuation, a
        # 27th language) scores ~alpha/(total+alphaV) per gram under
        # every REAL language — worse than uniform — so the background
        # wins and the model abstains instead of emitting a confident
        # wrong label (softmax-only scoring measured 0.977 'pl' on
        # 'zqx vprw qqj zzk xq'). In-distribution text beats uniform
        # by ~4+ nats/gram, so real predictions are unaffected.
        out["und"] = -len(grams) * math.log(self.v)
        return out

    def predict(self, text: str | None) -> str:
        return self.predict_with_confidence(text)[0]

    # posterior length normalization: scores are rescaled to an
    # EFFECTIVE length of min(n_grams, _N_EFF) grams before the
    # softmax. Raw doc-level posteriors saturate to 1.0 with length
    # (useless bins); raw per-gram averages over 26 classes are so
    # flat that gibberish and clean English land in the same bin
    # (measured: 0.433 vs 0.421). A capped effective length keeps the
    # posterior length-invariant for long docs while preserving the
    # margin signal the calibration bins need.
    _N_EFF = 40

    def raw_posterior(self, text: str | None) -> tuple[str, float]:
        """(argmax_lang, length-normalized softmax posterior) — the
        raw confidence the calibration bins are fit against."""
        # None / empty / whitespace-only: no linguistic content — the
        # padded norm of "" is two spaces whose grams are seen in
        # every language, so this must short-circuit, not score
        if text is None or not _WS.sub(" ", text).strip():
            return "und", 0.0
        grams = self._grams(text)
        if not grams:
            return "und", 0.0
        scores = self._scores(grams)
        # fixed declaration-order tie-break among real languages; the
        # background 'und' class wins only on a strict margin
        best = max(self.langs, key=lambda lg: (scores[lg], -self.langs.index(lg)))
        if scores["und"] > scores[best]:
            best = "und"
        scale = min(len(grams), self._N_EFF) / len(grams)
        sc = {lg: s * scale for lg, s in scores.items()}
        m = max(sc.values())
        z = sum(math.exp(a - m) for a in sc.values())
        return best, math.exp(sc[best] - m) / z

    def predict_with_confidence(self, text: str | None) -> tuple[str, float]:
        """(lang, P(correct)): posterior mapped through the calibration
        bins when present (bin accuracy on held-out-word sentences),
        else the raw posterior."""
        lang, p = self.raw_posterior(text)
        if lang == "und":
            # abstention: empty/None text carries 0.0; background-won
            # text carries its raw posterior ('confidence that the
            # text is NOT one of the trained languages'), uncalibrated
            # by design — the bins map P(correct|real label) only
            return lang, p
        for lo, hi, acc, _n in self.calibration:
            if lo <= p < hi:
                return lang, acc
        return lang, p


# default calibration bin edges: the raw per-gram posterior lives in
# [1/n_langs, 1); the low bins catch gibberish/ambiguous text, the top
# bins the confident calls
_CAL_EDGES = (0.0, 0.08, 0.15, 0.25, 0.40, 0.60, 0.80, 1.0000001)


def calibrate(
    model: CharNgramLangID,
    labeled: list[tuple[str, str]],
    edges: tuple[float, ...] = _CAL_EDGES,
) -> list[list]:
    """Fit the confidence map: bin the raw posterior over a labeled
    held-out set, record empirical accuracy per bin. Returns
    [[lo, hi, accuracy, n], ...] (empty bins carry the bin midpoint
    as a neutral prior so lookup never falls through)."""
    hits = [0] * (len(edges) - 1)
    tot = [0] * (len(edges) - 1)
    for true_lang, text in labeled:
        pred, p = model.raw_posterior(text)
        for b in range(len(edges) - 1):
            if edges[b] <= p < edges[b + 1]:
                tot[b] += 1
                hits[b] += int(pred == true_lang)
                break
    out = []
    for b in range(len(edges) - 1):
        lo, hi = edges[b], edges[b + 1]
        acc = hits[b] / tot[b] if tot[b] else (lo + min(hi, 1.0)) / 2
        out.append([lo, hi, round(acc, 6), tot[b]])
    return out


def write_charngram_langid(
    path: str,
    counts,
    vocab_size: int,
    order: int = 3,
    min_count: int = 1,
    max_rows: int = 2_000_000,
    calibration: list | None = None,
    alpha: float = 0.1,
) -> str:
    """Serialize trained counts as the gzip-json artifact. The one
    deliberate driver collect in this path, bounded the same two ways
    as write_trigram_lm: ``min_count`` prunes rare grams BEFORE the
    collect (pruned grams fall back to the add-one mass at inference),
    ``max_rows`` fails fast instead of OOMing mid-collect. Totals are
    computed pre-prune so pruning never shifts the denominator."""
    from pyspark.sql import functions as F

    counts = counts.persist()
    try:
        totals = {
            r["lang"]: r["t"]
            for r in counts.groupBy("lang")
            .agg(F.sum("n").alias("t"))
            .collect()
        }
        pruned = (
            counts.filter(F.col("n") >= min_count)
            if min_count > 1
            else counts
        )
        n_rows = pruned.count()
        if n_rows > max_rows:
            raise ValueError(
                f"write_charngram_langid: {n_rows} count rows after "
                f"min_count={min_count} pruning exceed "
                f"max_rows={max_rows} — raise min_count or max_rows"
            )
        tables: dict[str, dict[str, int]] = {}
        for r in pruned.collect():
            tables.setdefault(r["lang"], {})[r["gram"]] = r["n"]
    finally:
        counts.unpersist()
        for dep in getattr(counts, "_cached_deps", ()):
            dep.unpersist()
    payload = {
        "format": CHARNGRAM_FORMAT,
        "order": order,
        "alpha": alpha,
        "langs": sorted(tables),
        "vocab_size": int(vocab_size),
        "totals": {k: int(v) for k, v in totals.items()},
        "counts": tables,
        "calibration": calibration or [],
    }
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        json.dump(payload, fh, sort_keys=True)
    return path


def load_charngram_langid(path: str) -> CharNgramLangID:
    with gzip.open(path, "rt", encoding="utf-8") as fh:
        payload = json.load(fh)
    return charngram_from_payload(payload, path)


def charngram_from_payload(payload: dict, path: str = "?") -> CharNgramLangID:
    if payload.get("format") != CHARNGRAM_FORMAT:
        raise ValueError(f"not a {CHARNGRAM_FORMAT} artifact: {path}")
    return CharNgramLangID(
        payload["langs"],
        payload["counts"],
        payload["totals"],
        payload["vocab_size"],
        payload["order"],
        payload.get("calibration"),
        payload.get("alpha", 0.1),
    )


def train_langid_artifact(
    spark,
    path: str,
    n_per_lang: int = 120,
    seed: int = 7,
    order: int = 3,
    min_count: int = 1,
) -> str:
    """End-to-end: distributed training on the train-word corpus,
    confidence calibration on a held-out-WORD corpus (disjoint
    vocabulary AND a different draw seed from the test split the gate
    uses), artifact write. Returns ``path`` ready for
    SparkContext.addFile + $SPARK_DQC_LANGID_MODEL."""
    counts, vocab = train_charngram_counts(
        corpus_df(spark, n_per_lang, seed=seed, split="train"),
        order=order,
    )
    # build an uncalibrated in-memory model to fit the bins against
    tmp = write_charngram_langid(
        path, counts, vocab, order=order, min_count=min_count
    )
    model = load_charngram_langid(tmp)
    # calibration fits on the deployment-faithful MIXED regime
    # (trained function words + ~30% unseen vocabulary) with a draw
    # seed disjoint from both training and the test gates; the pure
    # held-out split is reserved for the adversarial transfer floor
    cal_set = [
        (lang, s)
        for lang in LANGID_LANGS
        for s in sentences(
            lang, max(20, n_per_lang // 4), seed=seed + 1, split="mixed"
        )
    ]
    cal = calibrate(model, cal_set)
    # rewrite with calibration attached (the artifact is small; a
    # second driver-side write beats carrying mutable state)
    with gzip.open(tmp, "rt", encoding="utf-8") as fh:
        payload = json.load(fh)
    payload["calibration"] = cal
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        json.dump(payload, fh, sort_keys=True)
    return path
