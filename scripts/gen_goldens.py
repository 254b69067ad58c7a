#!/usr/bin/env python3
"""Generate golden-parity fixtures by executing the REFERENCE's pure
Python functions on randomized inputs. Output: JSONL files under
src/test/resources/goldens/, consumed by ReferenceParitySpec.

Deterministic (seed 42). bs4/spacy are absent in this environment; bs4
is stubbed (the text-only functions never touch it) and the NLP skill
extractor is intentionally NOT golden-tested (it returns [] without
spaCy; our engine implements the deterministic catalog core instead —
see Skills.scaladoc).
"""
import json, random, sys, types, os

sys.path.insert(0, '/root/reference/spark/batch')
bs4 = types.ModuleType('bs4'); bs4.BeautifulSoup = None
sys.modules['bs4'] = bs4

from deduplicate import (normalize_text_udf, calculate_similarity_score_udf,
                         create_similarity_key_udf, calculate_completeness_score)
from extract_salary import parse_salary_comprehensive_udf, infer_salary_range_udf
from extract_sectors import classify_sector_udf
from extract_skills import classify_skill_category_udf, calculate_skill_confidence_udf
from parse_jobs import extract_skills_udf, extract_contract_type_udf
from load_to_bigquery import (generate_entreprise_id, generate_localisation_id,
                              generate_competence_id, parse_salary_amount,
                              infer_experience_level)

rng = random.Random(42)

WORDS = ("développeur senior python java ingénieur données chef projet de la les et "
         "pour chez NSIA banque Abidjan Bouaké comptable finance audit agile scrum "
         "c'est ça où quand BTP construction santé infirmier hôpital transport "
         "logistique cacao café agriculture énergie pétrole école université "
         "junior stage CDI CDD freelance mission manager lead architecte data "
         "scientist devops marketing tech excel sql docker kubernetes aws "
         "entre et à négociable selon expérience minimum FCFA EUR USD euros "
         "salaire rémunération 150000 800.000 1 200 000 2500 12,5 an ans mois "
         "r go ml ia & - ! ? () [] «» … 🚀").split(" ")

def rand_text(lo=0, hi=12):
    n = rng.randint(lo, hi)
    return " ".join(rng.choice(WORDS) for _ in range(n))

def maybe_null(s, p=0.1):
    return None if rng.random() < p else s

out_dir = "src/test/resources/goldens"
os.makedirs(out_dir, exist_ok=True)

def dump(name, rows):
    with open(f"{out_dir}/{name}.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    print(name, len(rows))

# F9 normalize + F11 key + F10 similarity
rows = []
for _ in range(300):
    t = maybe_null(rand_text())
    rows.append({"in": t, "out": normalize_text_udf(t)})
dump("normalize", rows)

rows = []
for _ in range(300):
    t, c, l = maybe_null(rand_text(0, 8)), maybe_null(rand_text(0, 4)), maybe_null(rand_text(0, 3))
    rows.append({"t": t, "c": c, "l": l,
                 "out": create_similarity_key_udf(t, c, l)})
dump("simkey", rows)

rows = []
for _ in range(300):
    args = [maybe_null(rand_text(0, 8), 0.05) for _ in range(6)]
    rows.append({"t1": args[0], "c1": args[1], "l1": args[2],
                 "t2": args[3], "c2": args[4], "l2": args[5],
                 "out": calculate_similarity_score_udf(*args)})
dump("similarity", rows)

rows = []
for _ in range(200):
    title = maybe_null(rand_text(0, 6))
    company = rng.choice([None, "Entreprise confidentielle", rand_text(1, 3)])
    desc = maybe_null(rand_text(0, 30))
    loc = rng.choice([None, "Côte d'Ivoire", "Abidjan", rand_text(1, 2)])
    skills = rng.choice([None, [], ["Python"], ["A", "B"]])
    sal = rng.choice([None, "", "800 000 FCFA", rand_text(0, 3)])
    rows.append({"title": title, "company": company, "desc": desc, "loc": loc,
                 "skills": skills, "sal": sal,
                 "out": calculate_completeness_score(title, company, desc, loc, skills, sal)})
dump("completeness", rows)

# F18/F19 salary
rows = []
for _ in range(400):
    s, d, t = maybe_null(rand_text(0, 8), 0.3), maybe_null(rand_text(0, 20), 0.3), maybe_null(rand_text(0, 5), 0.3)
    r = parse_salary_comprehensive_udf(s, d, t)
    rows.append({"s": s, "d": d, "t": t, "out": r})
dump("salary_parse", rows)

rows = []
for _ in range(200):
    t, l, c = maybe_null(rand_text(0, 5)), maybe_null(rand_text(0, 2)), rng.choice([None, "CDI", "CDD", "cdd temporaire"])
    rows.append({"t": t, "l": l, "c": c, "out": infer_salary_range_udf(t, l, c, None)})
dump("salary_infer", rows)

# F21 sectors
rows = []
for _ in range(300):
    t, c, d, l = (maybe_null(rand_text(0, 6), 0.15), maybe_null(rand_text(0, 3), 0.15),
                  maybe_null(rand_text(0, 25), 0.15), maybe_null(rand_text(0, 2), 0.15))
    rows.append({"t": t, "c": c, "d": d, "l": l,
                 "out": classify_sector_udf(t, c, d, l)})
dump("sector", rows)

# F16/F17 skill category + confidence
rows = []
for _ in range(200):
    s = maybe_null(rng.choice(["Python", "Power Bi", "Html", "Go", "weird", "",
                               rand_text(1, 2), "Machine Learning", "Kanban"]))
    rows.append({"s": s, "out": classify_skill_category_udf(s)})
dump("skillcat", rows)

rows = []
for _ in range(200):
    s = rng.choice(["python", "kafka", "sql", "x", rand_text(1, 1)])
    c = maybe_null(rand_text(0, 20))
    rows.append({"s": s, "c": c, "out": calculate_skill_confidence_udf(s, c)})
dump("skillconf", rows)

# F8 parse skills + F7 contract
rows = []
for _ in range(200):
    t = maybe_null(rand_text(0, 25))
    rows.append({"t": t, "out": sorted(extract_skills_udf(t))})
dump("parseskills", rows)

rows = []
for _ in range(200):
    t = maybe_null(rand_text(0, 15))
    rows.append({"t": t, "out": extract_contract_type_udf(t)})
dump("contract", rows)

# F22-F26 ids
rows = []
for _ in range(200):
    c = maybe_null(rand_text(0, 3))
    l = maybe_null(rng.choice(["Abidjan", "MAN", "man ", rand_text(0, 3)]))
    s = maybe_null(rand_text(0, 3))
    sal = maybe_null(rand_text(0, 5))
    t, d = maybe_null(rand_text(0, 5)), maybe_null(rand_text(0, 10))
    rows.append({
        "company": c, "loc": l, "skill": s, "sal": sal, "t": t, "d": d,
        "ent": generate_entreprise_id(c), "locid": generate_localisation_id(l),
        "comp": generate_competence_id(s), "amount": parse_salary_amount(sal),
        "exp": infer_experience_level(t, d)})
dump("ids", rows)
